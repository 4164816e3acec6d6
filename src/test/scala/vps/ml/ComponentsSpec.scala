package vps.ml

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import vps.SparkTestSession
import vps.text.TextOps

class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(pairs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  test("basic grouping: chains merge transitively, disjoint components stay apart") {
    val got = cc(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("self-pairs and duplicate edges are ignored; empty input yields empty output") {
    assert(cc(Seq((5L, 5L))) === Map.empty)
    assert(cc(Seq.empty) === Map.empty)
    // duplicate + reversed edges collapse to one component
    assert(cc(Seq((2L, 1L), (1L, 2L), (2L, 1L))) === Map(1L -> 1L, 2L -> 1L))
  }

  test("long planted chain converges in O(log n) rounds") {
    val n = 4096
    // permute ids so the component minimum is not adjacent to its neighbors in
    // the chain (the worst case for naive propagation)
    def perm(i: Int): Long = ((i.toLong * 2654435761L) % 1000003L) * 10 + 7
    val pairs = (0 until n - 1).map(i => (perm(i), perm(i + 1)))
    val (members, rounds) =
      Components.connectedComponentsWithStats(pairs.toDF("id_a", "id_b"))
    val rows = members.as[(Long, Long)].collect()
    val expectedMin = (0 until n).map(perm).min
    assert(rows.length === n)
    assert(rows.forall(_._2 == expectedMin), "every node labels to the chain minimum")
    // large-star/small-star halves chain length per round: ~log2(n) rounds.
    // log2(4096)=12; the +4 slack covers the final no-change confirmation
    // round and small constant effects.
    assert(rounds <= 16, s"expected O(log n) convergence, took $rounds rounds")
  }

  test("random graphs match a local union-find oracle") {
    def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        if (a != b) { val ra = find(a); val rb = find(b); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
      }
      val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      // only nodes in some non-trivial component (paired with a distinct node)
      val paired = pairs.filter(p => p._1 != p._2).flatMap(p => Seq(p._1, p._2)).toSet
      nodes.filter(paired).map(n => n -> find(n)).toMap
    }
    (1 to 5).foreach { seed =>
      val nNodes = 40 + seed * 17
      val nEdges = 60 + seed * 23
      val pairs = (0 until nEdges).map { i =>
        val h = vps.text.TextOps.mix64(seed.toLong * 1000003 + i)
        ((h & 0x7fffffff) % nNodes, ((h >>> 32) & 0x7fffffff) % nNodes)
      }
      val expected = unionFind(pairs)
      val got = cc(pairs)
      assert(got === expected, s"seed=$seed: distributed CC != union-find oracle")
    }
  }

  test("hot-root skew: a 200k-leaf star resolves without collected neighbor lists") {
    // the root's degree equals the component size — the case that breaks
    // collect_list-style CC implementations; ours only ever reduces min(v)
    // per node and joins, so this must complete quickly and exactly
    val n = 200000
    val hub = 7L
    val pairs = spark.range(0, n).toDF("i")
      .select(($"i" * 2 + 10).as("id_a"), lit(hub).as("id_b"))
    val (members, rounds) = Components.connectedComponentsWithStats(pairs)
    assert(members.count() === n + 1L)
    assert(members.where($"component" =!= hub).count() === 0)
    assert(rounds <= 4, s"a star is already (almost) converged, took $rounds rounds")
  }

  test("reliable checkpointing: same result, superseded round files deleted") {
    val ckpt = java.nio.file.Files.createTempDirectory("cc-ckpt").toString
    spark.sparkContext.setCheckpointDir(ckpt)
    try {
      def perm(i: Int): Long = ((i.toLong * 48271) % 65537) * 3 + 1
      val pairs = (0 until 255).map(i => (perm(i), perm(i + 1)))
      val (members, rounds) =
        Components.connectedComponentsWithStats(pairs.toDF("id_a", "id_b"))
      val rows = members.as[(Long, Long)].collect()
      val expectedMin = (0 until 256).map(perm).min
      assert(rows.length === 256 && rows.forall(_._2 == expectedMin))
      // superseded rounds' checkpoints were deleted: only the final round's
      // rdd-* dir (the one the membership frame reads) may remain
      val rddDirs = new java.io.File(ckpt).listFiles()
        .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
        .filter(_.getName.startsWith("rdd-"))
      assert(rddDirs.length <= 1,
        s"expected <= 1 surviving checkpoint after $rounds rounds, found ${rddDirs.length}")
    } finally {
      // restore the no-checkpoint default for the shared session
      spark.sparkContext.setCheckpointDir(null)
    }
  }

  test("near-dup membership groups a transitive text chain A~B~C with A!~C") {
    // Three texts over distinctive word blocks: A=[0..6], B=[1..7], C=[2..8].
    // Adjacent overlap 6/8 blocks (jaccard ~0.6), endpoints 5/9 (~0.45):
    // with minJaccard between them only A-B and B-C verify, yet all three
    // must land in ONE group via connected components.
    def block(i: Int): String =
      (0 until 30).map(j => ('a' + (TextOps.mix64(i * 131L + j) % 26 + 26) % 26).toChar).mkString
    def text(blocks: Range): String = blocks.map(block).mkString(" ")
    val a = text(0 to 6)
    val b = text(1 to 7)
    val c = text(2 to 8)
    val jab = TextOps.jaccard(a, b, 5)
    val jbc = TextOps.jaccard(b, c, 5)
    val jac = TextOps.jaccard(a, c, 5)
    // self-validating thresholds: the chain straddles minJaccard
    val minJ = (jac + math.min(jab, jbc)) / 2
    assert(jab > minJ && jbc > minJ, s"adjacent pairs must verify: $jab, $jbc vs $minJ")
    assert(jac < minJ, s"endpoints must NOT verify directly: $jac vs $minJ")

    val docs = Seq((100L, a), (200L, b), (300L, c), (900L, "completely unrelated text body"))
      .toDF("id", "text")
    // 32 bands x 2 rows: collision probability at jaccard ~0.5 is
    // 1-(1-0.25)^32 ~ 0.9999 — candidate recall is certain; precision comes
    // from the exact-jaccard verify at minJ
    val members = Dedup.nearDuplicateMembership(docs,
      numHashes = 64, bands = 32, minJaccard = minJ)
      .as[(Long, Long)].collect().toMap
    assert(members === Map(100L -> 100L, 200L -> 100L, 300L -> 100L))

    // and the pair list itself must NOT contain the endpoint pair
    val pairs = Dedup.minhashCandidates(docs, numHashes = 64, bands = 32, minJaccard = minJ)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(!pairs.contains((100L, 300L)) && !pairs.contains((300L, 100L)))
  }

  test("identical-copy groups of size 3 resolve to one keeper") {
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id".as("id"), $"text").where($"id" < 20)
    val all = base
      .union(base.select(($"id" + 1000).as("id"), $"text"))
      .union(base.select(($"id" + 2000).as("id"), $"text"))
    val members = Dedup.nearDuplicateMembership(all, minJaccard = 0.995)
      .as[(Long, Long)].collect().toMap
    (0 until 20).foreach { i =>
      assert(members(i.toLong) === i.toLong)
      assert(members(i + 1000L) === i.toLong)
      assert(members(i + 2000L) === i.toLong)
    }
  }
}
