package vps.ml

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * - [[bruteTopK]]: exact cosine top-k; broadcast queries, per-partition bounded
  *   heaps, one small shuffle — the correctness baseline and the right choice
  *   when |queries| is small.
  * - [[ivfTopK]]: IVF-style scale path — vectors pre-assigned to the nearest of
  *   C centroids (one cheap pass; centroids deterministic), queries probe the
  *   nProbe nearest lists only, exact cosine inside. Recall grows with nProbe;
  *   nProbe = C degenerates to exact.
  */
object VectorSearch {

  /** one shared encoder: resolving an ExpressionEncoder is not free and every
    * entry point needs this exact shape
    */
  private lazy val floatArrayEnc =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]()

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  private val outSchema = StructType(Seq(
    StructField("query_id", LongType, nullable = false),
    StructField("neighbor_id", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = false)))

  /** Exact top-k by cosine. Output: (query_id, neighbor_id, cosine, rank). */
  def bruteTopK(
      vectors: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      queryIdCol: String = "query_id",
      queryVecCol: String = "embedding"): DataFrame = {
    val spark = vectors.sparkSession
    val qs: Array[(Long, Array[Float])] = queries
      .select(col(queryIdCol).cast("long"), col(queryVecCol))
      .as[(Long, Array[Float])](Encoders.tuple(Encoders.scalaLong, floatArrayEnc))
      .collect()
    val bc = spark.sparkContext.broadcast(qs)

    // typed tuples: the encoder hands back primitive Array[Float] — a Row's
    // generic getSeq[Float] would box every element (measured GC bottleneck)
    val typed = vectors.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])](Encoders.tuple(Encoders.scalaLong, floatArrayEnc))

    val candidates = typed.mapPartitions { rows =>
      val queries = bc.value
      val heaps = queries.map { case (qid, _) =>
        // min-heap on cosine: head = weakest kept candidate
        qid -> new scala.collection.mutable.PriorityQueue[(Double, Long)]()(
          Ordering.by[(Double, Long), (Double, Long)] { case (c, id) => (-c, id) })
      }.toMap
      rows.foreach { case (id, v) =>
        queries.foreach { case (qid, qv) =>
          val c = cos(v, qv)
          val h = heaps(qid)
          if (h.size < k) h.enqueue((c, id))
          else {
            val (wc, wid) = h.head
            if (c > wc || (c == wc && id < wid)) { h.dequeue(); h.enqueue((c, id)) }
          }
        }
      }
      heaps.iterator.flatMap { case (qid, h) => h.iterator.map { case (c, id) => Row(qid, id, c) } }
    }(Encoders.row(outSchema))

    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    candidates.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Deterministic coarse centroid INIT: the `c` vectors with the smallest
    * xxhash64(id) — a uniform, seed-free pseudo-random sample computed as a
    * distributed top-c (TakeOrdered), no global sort.
    */
  def coarseCentroids(vectors: DataFrame, c: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Array[(Int, Array[Float])] =
    vectors.orderBy(xxhash64(col(idCol)), col(idCol)).limit(c)
      .select(col(idCol), col(vecCol))
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1).toArray) }

  private def hash01(id: Long, round: Int): Double = {
    val h = vps.text.TextOps.mix64(id * 0x9E3779B97F4A7C15L + round.toLong * 0xC2B2AE3D27D4EB4FL)
    (h >>> 11) * (1.0 / (1L << 53))
  }

  private def dist2(v: Array[Float], cents: Array[Array[Float]]): Double = {
    var best = Double.MaxValue
    var i = 0
    while (i < cents.length) {
      val d = 1.0 - cos(v, cents(i)); if (d < best) best = d
      i += 1
    }
    best
  }

  /** k-means|| oversampled init (Bahmani et al., VLDB 2012 — public paper),
    * deterministic sampling: each round every vector joins the candidate set
    * with probability min(1, l * d²/φ), where the coin is a hash of
    * (id, round) — no RNG state, so runs reproduce exactly on a fixed
    * partitioning. Across DIFFERENT partition counts the per-vector coins are
    * unchanged but φ is a floating-point sum whose partial-sum grouping
    * follows the partitioning, so a coin sitting within ~1 ulp of its
    * threshold can flip — reproducibility across cluster sizes is
    * near-exact, not bit-exact. Each round costs two scans of the persisted
    * corpus (cost φ, then sample) and no shuffle; candidates (≈ rounds × l
    * vectors) are weighted by attraction counts and reduced to `c` centroids
    * with a LOCAL weighted Lloyd on the driver. Distance is 1 − cosine,
    * matching the IVF assignment metric.
    */
  def kmeansParallelInit(
      vectors: DataFrame,
      c: Int,
      rounds: Int = 3,
      oversampleFactor: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Array[(Int, Array[Float])] = {
    val spark = vectors.sparkSession
    val l = math.max(1, oversampleFactor * c)
    // persisted for the whole init: every round scans it twice (phi + sample)
    // and the weighting pass once more
    val typed = vectors.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])](Encoders.tuple(Encoders.scalaLong, floatArrayEnc))
      .rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cands: Array[Array[Float]] = coarseCentroids(vectors, 1, idCol, vecCol).map(_._2)
    var r = 1
    while (r <= rounds) {
      val bc = spark.sparkContext.broadcast(cands)
      val phi = typed.map { case (_, v) => dist2(v, bc.value) }.sum()
      if (phi <= 0) { bc.unpersist(); r = rounds + 1 }
      else {
        val round = r
        val picked = typed.filter { case (id, v) =>
          hash01(id, round) < l * dist2(v, bc.value) / phi
        }.map(_._2).collect()
        bc.unpersist()
        cands = cands ++ picked
        r += 1
      }
    }
    // attraction weights: how many corpus vectors are nearest to each candidate
    val bc = spark.sparkContext.broadcast(cands)
    val weights = typed.mapPartitions { rows =>
      val cs = bc.value
      val n = new Array[Long](cs.length)
      rows.foreach { case (_, v) =>
        var best = 0; var bestD = Double.MaxValue
        var i = 0
        while (i < cs.length) {
          val d = 1.0 - cos(v, cs(i)); if (d < bestD) { bestD = d; best = i }
          i += 1
        }
        n(best) += 1
      }
      Iterator.single(n)
    }.treeReduce { (a, b) => var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a }
    bc.unpersist()
    typed.unpersist(blocking = false)
    val reduced = weightedLloydLocal(cands, weights, c)
    // tiny corpora can yield < c candidates: top up from the hash sample
    val topped =
      if (reduced.length >= c) reduced
      else reduced ++ coarseCentroids(vectors, c, idCol, vecCol)
        .map(_._2).filterNot(v => reduced.exists(_.sameElements(v)))
        .take(c - reduced.length)
    topped.take(c).zipWithIndex.map { case (v, i) => (i, v) }
  }

  /** Local deterministic weighted Lloyd over the (small) candidate set:
    * init = top-c candidates by weight, 20 refinement passes, 1−cos metric.
    */
  private def weightedLloydLocal(
      cands: Array[Array[Float]], w: Array[Long], c: Int, iters: Int = 20): Array[Array[Float]] = {
    if (cands.length <= c) return cands
    val order = cands.indices.sortBy(i => (-w(i), i))
    var cents = order.take(c).map(cands(_)).toArray
    val dim = cands(0).length
    var it = 0
    while (it < iters) {
      val sums = Array.ofDim[Double](c, dim)
      val n = new Array[Double](c)
      var i = 0
      while (i < cands.length) {
        var best = 0; var bestD = Double.MaxValue
        var j = 0
        while (j < c) {
          val d = 1.0 - cos(cands(i), cents(j)); if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        val wt = math.max(1L, w(i)).toDouble
        var d = 0
        while (d < dim) { sums(best)(d) += cands(i)(d) * wt; d += 1 }
        n(best) += wt
        i += 1
      }
      cents = Array.tabulate(c) { j =>
        if (n(j) == 0) cents(j)
        else Array.tabulate(dim)(d => (sums(j)(d) / n(j)).toFloat)
      }
      it += 1
    }
    cents
  }

  /** Centroids after `iters` Lloyd passes from the deterministic init. Each
    * pass is one map-side assignment + per-partition partial sums combined on
    * the driver (c x dim doubles — constant-size, broadcast-scale), so a pass
    * costs one corpus scan and no shuffle. Empty clusters keep their previous
    * centroid. `initRounds > 0` switches the init from the hash sample to
    * [[kmeansParallelInit]] with that many oversampling rounds.
    */
  def trainCentroids(
      vectors: DataFrame,
      c: Int,
      iters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      initRounds: Int = 0): Array[(Int, Array[Float])] = {
    val spark = vectors.sparkSession
    var cents =
      if (initRounds > 0) kmeansParallelInit(vectors, c, initRounds, idCol = idCol, vecCol = vecCol)
      else coarseCentroids(vectors, c, idCol, vecCol)
    if (iters <= 0 || cents.isEmpty) return cents
    val dim = cents(0)._2.length
    val typed = vectors.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])](Encoders.tuple(Encoders.scalaLong, floatArrayEnc))
      .rdd
    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val (sums, counts) = typed.mapPartitions { rows =>
        val cs = bc.value
        val s = Array.ofDim[Double](cs.length, dim)
        val n = new Array[Long](cs.length)
        rows.foreach { case (_, v) =>
          var best = 0; var bestCos = Double.MinValue
          cs.foreach { case (ci, cv) =>
            val cc = cos(v, cv); if (cc > bestCos) { bestCos = cc; best = ci }
          }
          var d = 0
          while (d < dim && d < v.length) { s(best)(d) += v(d); d += 1 }
          n(best) += 1
        }
        Iterator.single((s, n))
      }.treeReduce { case ((s1, n1), (s2, n2)) =>
        var i = 0
        while (i < s1.length) {
          var d = 0
          while (d < dim) { s1(i)(d) += s2(i)(d); d += 1 }
          n1(i) += n2(i)
          i += 1
        }
        (s1, n1)
      }
      cents = cents.map { case (ci, old) =>
        if (counts(ci) == 0) (ci, old)
        else (ci, Array.tabulate(dim)(d => (sums(ci)(d) / counts(ci)).toFloat))
      }
      bc.unpersist()
      it += 1
    }
    cents
  }

  /** Measured recall@k of [[ivfTopK]] against [[bruteTopK]] for each nProbe —
    * the IVF quality curve (fraction of true top-k neighbors retrieved,
    * averaged over queries).
    */
  def recallAtK(
      vectors: DataFrame,
      queries: DataFrame,
      k: Int,
      numCentroids: Int,
      nProbes: Seq[Int],
      trainIters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      queryIdCol: String = "query_id",
      queryVecCol: String = "embedding",
      initRounds: Int = 0): Seq[(Int, Double)] = {
    val truth = bruteTopK(vectors, queries, k, idCol, vecCol, queryIdCol, queryVecCol)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    nProbes.map { np =>
      val got = ivfTopK(vectors, queries, k, numCentroids, np, trainIters,
        idCol, vecCol, queryIdCol, queryVecCol, initRounds)
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      np -> (if (truth.isEmpty) 1.0 else truth.count(got.contains).toDouble / truth.size)
    }
  }

  /** Build a PERSISTED IVF index under `indexDir`, so training and assignment
    * amortize across query batches ([[ivfTopK]] rebuilds per call):
    * - `indexDir/centroids`: (list_id, centroid) — numCentroids rows,
    * - `indexDir/lists`: (id, vec) parquet PARTITIONED BY list_id, so a
    *   [[searchIndex]] probing nProbe of c lists prunes the scan to
    *   ~nProbe/c of the corpus at the file level (partition pruning, visible
    *   as PartitionFilters in the plan).
    */
  def buildIndex(
      vectors: DataFrame,
      indexDir: String,
      numCentroids: Int = 16,
      trainIters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      initRounds: Int = 0): Unit = {
    val spark = vectors.sparkSession
    val cents = trainCentroids(vectors, numCentroids, trainIters, idCol, vecCol, initRounds)
    val bc = spark.sparkContext.broadcast(cents)

    spark.createDataset(cents.toIndexedSeq)(Encoders.tuple(Encoders.scalaInt, floatArrayEnc))
      .toDF("list_id", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$indexDir/centroids")

    val typedVecs = vectors.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])](Encoders.tuple(Encoders.scalaLong, floatArrayEnc))
    typedVecs.mapPartitions { rows =>
      val cs = bc.value
      rows.map { case (id, v) =>
        var best = 0; var bestCos = Double.MinValue
        cs.foreach { case (ci, cv) =>
          val c = cos(v, cv); if (c > bestCos) { bestCos = c; best = ci }
        }
        (best, id, v)
      }
    }(Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong, floatArrayEnc))
      .toDF("list_id", "id", "vec")
      .write.mode("overwrite").partitionBy("list_id").parquet(s"$indexDir/lists")
  }

  /** Probe a persisted IVF index ([[buildIndex]]): no training, no corpus
    * scan — centroids load once (numCentroids rows) and only the probed
    * list partitions are read. Same semantics as [[ivfTopK]] with the same
    * centroids: at nProbe = numCentroids it is exact.
    */
  def searchIndex(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String,
      queries: DataFrame,
      k: Int,
      nProbe: Int = 4,
      queryIdCol: String = "query_id",
      queryVecCol: String = "embedding"): DataFrame = {
    val cents: Array[(Int, Array[Float])] = spark.read.parquet(s"$indexDir/centroids")
      .select(col("list_id"), col("centroid"))
      .as[(Int, Array[Float])](Encoders.tuple(Encoders.scalaInt, floatArrayEnc))
      .collect()
    val bc = spark.sparkContext.broadcast(cents)

    val typedQueries = queries.select(col(queryIdCol).cast("long"), col(queryVecCol))
      .as[(Long, Array[Float])](Encoders.tuple(Encoders.scalaLong, floatArrayEnc))
    val probes = typedQueries.mapPartitions { rows =>
      val cs = bc.value
      rows.flatMap { case (qid, v) =>
        cs.map { case (ci, cv) => (cos(v, cv), ci) }
          .sortBy { case (c, ci) => (-c, ci) }
          .take(nProbe)
          .map { case (_, ci) => (ci, qid, v) }
      }
    }(Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong, floatArrayEnc))
      .toDF("list_id", "query_id", "qvec")

    // the query side is broadcast-scale by contract (like knnBroadcast), so
    // the probed list ids collect cheaply and prune the lists scan statically
    val probedIds = probes.select(col("list_id")).distinct()
      .as[Int](Encoders.scalaInt).collect().toSeq
    val lists = spark.read.parquet(s"$indexDir/lists")
      .where(col("list_id").isin(probedIds: _*))

    import vps.text.functions.cosine_sim
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    probes.join(lists, Seq("list_id"))
      .withColumn("cosine", cosine_sim(col("qvec"), col("vec")))
      .select(col("query_id"), col("id").as("neighbor_id"), col("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** IVF search: assign every vector to its nearest centroid (broadcast,
    * map-side), probe the nProbe nearest lists per query via an equi-join on the
    * centroid id, exact cosine + top-k inside. Rebuilds the index per call —
    * use [[buildIndex]]/[[searchIndex]] to amortize training across batches.
    */
  def ivfTopK(
      vectors: DataFrame,
      queries: DataFrame,
      k: Int,
      numCentroids: Int = 16,
      nProbe: Int = 4,
      trainIters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      queryIdCol: String = "query_id",
      queryVecCol: String = "embedding",
      initRounds: Int = 0): DataFrame = {
    val spark = vectors.sparkSession
    val cents = trainCentroids(vectors, numCentroids, trainIters, idCol, vecCol, initRounds)
    val bc = spark.sparkContext.broadcast(cents)

    // typed tuple encoders on BOTH sides: Row(..., v.toSeq) boxes every float
    // of every vector once per build — the encoder hands primitive
    // Array[Float] straight through (same reason as bruteTopK's typed input)
    val assignEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong, floatArrayEnc)
    val typedVecs = vectors.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])](Encoders.tuple(Encoders.scalaLong, floatArrayEnc))
    val assigned = typedVecs.mapPartitions { rows =>
      val cs = bc.value
      rows.map { case (id, v) =>
        var best = 0; var bestCos = Double.MinValue
        cs.foreach { case (ci, cv) =>
          val c = cos(v, cv); if (c > bestCos) { bestCos = c; best = ci }
        }
        (best, id, v)
      }
    }(assignEnc).toDF("list_id", "id", "vec")

    val typedQueries = queries.select(col(queryIdCol).cast("long"), col(queryVecCol))
      .as[(Long, Array[Float])](Encoders.tuple(Encoders.scalaLong, floatArrayEnc))
    val probes = typedQueries.mapPartitions { rows =>
      val cs = bc.value
      rows.flatMap { case (qid, v) =>
        cs.map { case (ci, cv) => (cos(v, cv), ci) }
          .sortBy { case (c, ci) => (-c, ci) }
          .take(nProbe)
          .map { case (_, ci) => (ci, qid, v) }
      }
    }(assignEnc).toDF("list_id", "query_id", "qvec")

    import vps.text.functions.cosine_sim
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    probes.join(assigned, Seq("list_id"))
      .withColumn("cosine", cosine_sim(col("qvec"), col("vec")))
      .select(col("query_id"), col("id").as("neighbor_id"), col("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
