package vps.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair/edge list — the group-resolution
  * step a dedup pipeline runs after LSH candidate generation: verified
  * near-duplicate PAIRS (A~B, B~C) become duplicate GROUPS ({A,B,C} with one
  * deterministic keep id), exactly the relational membership shape
  * [[Dedup.exactDuplicateMembership]] produces for byte-identical texts.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC 2014) — the shuffle-bounded
  * formulation that converges in O(log n) rounds on pathological long chains,
  * where naive label propagation needs O(n) rounds (one hop per round).
  * No driver-side union-find: every round is two reducing aggregations and two
  * equi-joins over the (bigint, bigint) edge list, so per-round shuffle volume
  * is O(|edges| x 16 bytes) regardless of component size or skew.
  *
  * Per-round plan (both stars have the same shape):
  *   1. `groupBy(u).agg(min(v))` — a REDUCING aggregate (map-side partial
  *      combine), so the root of a 10^8-node component costs one counter per
  *      map partition, never a collected neighbor list;
  *   2. edges equi-join the per-node min on `u` — the hot root key is exactly
  *      the skewed-join case AQE's skew-split handles.
  *
  * Lineage is truncated every round so the driver-side plan stays O(1) deep
  * across iterations: with `spark.sparkContext.setCheckpointDir` configured
  * the rounds use RELIABLE `checkpoint()` (executor loss survivable — the
  * cluster posture); otherwise `localCheckpoint()` (block-manager storage,
  * fine for a single JVM).
  *
  * Convergence: a round is a no-op exactly when the edge set (canonically
  * oriented big->small, deduped) is unchanged; detected with a set
  * fingerprint — (count, xor, sum) of a per-edge 64-bit mix — computed by an
  * accumulator ON THE ROUND'S OWN MATERIALIZATION, so a round is a single
  * job (no separate fingerprint aggregate, no extra scan). The accumulator
  * uses per-partition REPLACE semantics, making it idempotent under reliable
  * checkpoint's recompute job and task retries. Three independent reductions
  * (count + xor + sum) make an accidental collision — same count AND same
  * xor AND same sum over a different set — cryptographically unlikely.
  */
object Components {

  /** Connected components of the undirected graph given as a pair list.
    * Output: `(id, component)` — one row per distinct node, `component` = the
    * MINIMUM id in the node's component (a deterministic keep id). Self-pairs
    * and null ids are ignored; isolated nodes never appear (no pairs => no
    * duplicate group), matching `exactDuplicateMembership`'s "only duplicated
    * documents" contract.
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String = "id_a",
      bCol: String = "id_b",
      maxRounds: Int = 50): DataFrame =
    connectedComponentsWithStats(pairs, aCol, bCol, maxRounds)._1

  /** [[connectedComponents]] plus the number of large+small-star rounds it
    * took to converge (the O(log n) gate asserted by the long-chain spec).
    */
  def connectedComponentsWithStats(
      pairs: DataFrame,
      aCol: String = "id_a",
      bCol: String = "id_b",
      maxRounds: Int = 50): (DataFrame, Int) = {
    val spark = pairs.sparkSession
    val sc = spark.sparkContext
    val reliable = sc.getCheckpointDir.isDefined

    // Edge rows are 16 bytes, so AQE's byte-based coalescing funnels the
    // per-round joins/aggregations into a handful of partitions at the 64 MB
    // default advisory size (measured 1.4x slower at 19M edges). Scope a
    // smaller advisory size to this loop and restore the caller's setting.
    val advisoryKey = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val prevAdvisory = spark.conf.getOption(advisoryKey)
    spark.conf.set(advisoryKey, "8m")
    try {
      runStars(pairs, aCol, bCol, maxRounds, reliable)
    } finally {
      prevAdvisory match {
        case Some(v) => spark.conf.set(advisoryKey, v)
        case None => spark.conf.unset(advisoryKey)
      }
    }
  }

  private def runStars(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxRounds: Int,
      reliable: Boolean): (DataFrame, Int) = {
    val spark = pairs.sparkSession
    val sc = spark.sparkContext
    import spark.implicits._
    // Materialize a round AND fingerprint it in the same job: wrap the edge
    // iterator so each task folds (count, xor, sum) of a per-edge mix into a
    // per-partition accumulator slot as the checkpoint writes flow past.
    // REPLACE semantics per partition id keep the value exact when reliable
    // checkpointing recomputes the RDD in its second job (or a task retries).
    def truncate(df: DataFrame): (DataFrame, (Long, Long, Long)) = {
      val acc = new FingerprintAcc
      sc.register(acc, "cc-edge-fingerprint")
      val tagged = df.as[(Long, Long)].mapPartitions { it =>
        new Iterator[(Long, Long)] {
          private var cnt = 0L; private var xor = 0L; private var sum = 0L
          private var flushed = false
          override def hasNext: Boolean = {
            val h = it.hasNext
            if (!h && !flushed) {
              flushed = true
              acc.add((org.apache.spark.TaskContext.getPartitionId(), (cnt, xor, sum)))
            }
            h
          }
          override def next(): (Long, Long) = {
            val e = it.next()
            val h = Components.edgeHash(e._1, e._2)
            cnt += 1; xor ^= h; sum += h
            e
          }
        }
      }.toDF("u", "v")
      val out = if (reliable) tagged.checkpoint(true) else tagged.localCheckpoint(true)
      val parts = acc.value.values
      (out,
        (parts.map(_._1).sum, parts.foldLeft(0L)(_ ^ _._2), parts.map(_._3).sum))
    }
    // a superseded round's checkpoint files are dead the moment the next
    // round is materialized — delete them, or O(rounds) full edge-list copies
    // accumulate on checkpoint storage (the cleaner does not remove them by
    // default). The FINAL round's checkpoint stays: the returned membership
    // frame still reads from it.
    def release(df: DataFrame): Unit = {
      df.unpersist()
      // Dataset.checkpoint wraps the checkpointed internal RDD in a
      // LogicalRDD — that RDD (not a derived df.rdd) holds the file location
      if (reliable) df.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.flatMap(_.getCheckpointFile).foreach { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(sc.hadoopConfiguration).delete(p, true)
      }
    }
    var (edges, fp) = truncate(canonical(
      pairs.select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
        .where(col("u").isNotNull && col("v").isNotNull)))

    var rounds = 0
    var converged = fp._1 == 0L // empty input: already done
    while (!converged && rounds < maxRounds) {
      val prev = edges
      val (next, nextFp) = truncate(canonical(smallStar(largeStar(edges))))
      edges = next
      rounds += 1
      converged = nextFp == fp
      fp = nextFp
      release(prev)
    }
    require(converged, s"connectedComponents did not converge in $maxRounds rounds " +
      "(rounds grow ~log2 of the longest chain; raise maxRounds)")

    // Converged state is a star forest: every non-root node appears exactly
    // once as `u` (edges are canonical-deduped and stability under both stars
    // implies one parent per node), so only the root side needs deduping —
    // a |roots|-sized distinct instead of one over 2x|edges| rows.
    val members = edges.select(col("u").as("id"), col("v").as("component"))
      .unionAll(edges.select(col("v").as("id"), col("v").as("component")).distinct())
    (members, rounds)
  }

  /** Canonical edge form: big->small, no self-loops, deduped. */
  private def canonical(edges: DataFrame): DataFrame =
    edges.where(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()

  /** large-star: for every node u, connect each strictly LARGER neighbor to
    * m = min(N(u) u {u}). Works on the symmetrized neighbor view.
    */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.unionAll(edges.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min("v").as("mv"))
      .select(col("u"), least(col("mv"), col("u")).as("m"))
    sym.join(mins, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
  }

  /** small-star: for every node u over its SMALLER neighbors N(u), connect
    * each of N(u) u {u} except the minimum m to m.
    *
    * Input contract: already big->small oriented with no self-loops —
    * exactly what [[largeStar]] emits ((v, m) with v > u >= m). Duplicate
    * edges are ALLOWED and not deduped here: `min()` is
    * duplicate-insensitive and the caller's outer [[canonical]] dedups the
    * output, so the old internal `canonical()` pass was a redundant
    * full-edge-list shuffle per round (one of ~6 — measured ~8% off the
    * 19M-edge round time when removed).
    */
  private def smallStar(edges: DataFrame): DataFrame = {
    val mins = edges.groupBy("u").agg(min("v").as("m"))
    val neighbors = edges.join(mins, "u")
      .where(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
    neighbors.unionAll(mins.select(col("u"), col("m").as("v")))
  }

  /** splitmix64 finalizer — the per-edge mix feeding the set fingerprint. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  private[ml] def edgeHash(u: Long, v: Long): Long =
    mix64(mix64(u) ^ java.lang.Long.rotateLeft(mix64(v), 1))

  /** Per-partition (count, xor, sum) fingerprint slots with REPLACE
    * semantics: re-adding a partition's value (checkpoint recompute job,
    * task retry, speculative duplicate) overwrites with the identical value
    * instead of double-counting.
    */
  private final class FingerprintAcc
      extends org.apache.spark.util.AccumulatorV2[
        (Int, (Long, Long, Long)), Map[Int, (Long, Long, Long)]] {
    private val m = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Long)]()
    override def isZero: Boolean = m.isEmpty
    override def copy(): FingerprintAcc = { val c = new FingerprintAcc; c.m.putAll(m); c }
    override def reset(): Unit = m.clear()
    override def add(v: (Int, (Long, Long, Long))): Unit = m.put(v._1, v._2)
    override def merge(
        o: org.apache.spark.util.AccumulatorV2[(Int, (Long, Long, Long)), Map[Int, (Long, Long, Long)]]): Unit =
      o.value.foreach { case (k, v) => m.put(k, v) }
    override def value: Map[Int, (Long, Long, Long)] = {
      import scala.jdk.CollectionConverters._
      m.asScala.toMap
    }
  }
}
