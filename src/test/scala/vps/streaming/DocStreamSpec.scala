package vps.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import vps.SparkTestSession

class DocStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("micro-batch source: batch clamping, full drain, deterministic rows") {
    val q = spark.readStream
      .format("interleaved-docs")
      .option("head", 10)
      .option("batch_size", 3)
      .option("rows_per_sequence", 50)
      .load()
      .writeStream
      .format("memory")
      .queryName("docstream")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      q.processAllAvailable()
      val out = spark.table("docstream")
      assert(out.count() === 10L * 50)
      // batch clamping: no micro-batch covered more than 3 sequences
      val progress = q.recentProgress
      assert(progress.nonEmpty)
      // rows deterministic: doc_id 123 has the formula point
      val r = out.where($"doc_id" === "doc123")
        .select(element_at($"spans", 2).getField("text")).as[String].head()
      val lon = (123L * 9973 % 3600000) / 10000.0 - 180.0
      val lat = (123L * 6151 % 1600000) / 10000.0 - 80.0
      assert(r === f"POINT ($lon%.4f $lat%.4f)")
      // span schema matches the input_hint shape
      val spanFields = out.schema("spans").dataType
        .asInstanceOf[org.apache.spark.sql.types.ArrayType]
        .elementType.asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
      assert(spanFields.toSeq === Seq("kind", "text", "media_ref", "offset"))
      // each sequence contributed exactly rows_per_sequence
      val perSeq = out.groupBy($"sequence").count().as[(Int, Long)].collect().toMap
      assert(perSeq.size === 10 && perSeq.values.forall(_ === 50L))
    } finally q.stop()
  }

  test("checkpoint resume: restart continues from committed sequence") {
    val ckpt = java.nio.file.Files.createTempDirectory("docstream-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("docstream-out").toString
    def run(head: Int): Unit = {
      val q = spark.readStream
        .format("interleaved-docs")
        .option("head", head)
        .option("batch_size", 2)
        .option("rows_per_sequence", 10)
        .load()
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run(4)
    assert(spark.read.parquet(out).count() === 40)
    // restart with a larger head: only NEW sequences (4..8) appended, no re-read
    run(8)
    val all = spark.read.parquet(out)
    assert(all.count() === 80)
    val perSeq = all.groupBy($"sequence").count().as[(Int, Long)].collect().toMap
    assert(perSeq.keySet === (0 until 8).toSet)
    assert(perSeq.values.forall(_ === 10L), s"resume must not duplicate: $perSeq")
  }

  test("changesets feed: distinct nested schema, stream == batch mirror, clamp + drain") {
    val q = spark.readStream
      .format("changesets")
      .option("head", 6)
      .option("batch_size", 2)
      .option("rows_per_sequence", 25)
      .load()
      .writeStream.format("memory").queryName("cs").trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      q.processAllAvailable()
      val out = spark.table("cs")
      assert(out.count() === 6L * 25)
      assert(out.schema === Changesets.schema)
      // nested comments array content matches the shared generator exactly
      val got = out.where($"changeset_id" === 123L)
        .select($"user", $"closed_at", $"open", explode($"comments").as("c"))
        .select($"user", $"closed_at", $"open", $"c.user", $"c.ts", $"c.text")
        .as[(String, Option[Long], Boolean, String, Long, String)].collect().toSet
      val want = Changesets.value(123 / 25, 123 % 25, 25)
      assert(got === want.comments.map(c =>
        (want.user, want.closed_at, want.open, c.user, c.ts, c.text)).toSet)
      // the full drained stream equals the batch mirror row-for-row
      val streamRows = out.drop("comments")
        .orderBy("changeset_id").collect().map(_.toSeq).toSeq
      val batchRows = Changesets.frame(spark, 6, 25).drop("comments")
        .orderBy("changeset_id").collect().map(_.toSeq).toSeq
      assert(streamRows === batchRows)
    } finally q.stop()
  }

  test("augmented-diffs feed: prev/current pair schema, stream == batch mirror") {
    val q = spark.readStream
      .format("augmented-diffs")
      .option("head", 5)
      .option("batch_size", 2)
      .option("rows_per_sequence", 40)
      .load()
      .writeStream.format("memory").queryName("diffs").trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      q.processAllAvailable()
      val out = spark.table("diffs")
      assert(out.count() === 5L * 40)
      assert(out.schema === Diffs.schema)
      // creates: every prev_* field null; edits: pair fields populated
      assert(out.where($"id" % 7 === 0)
        .where($"prev_tags".isNotNull || $"prev_geom_wkt".isNotNull ||
          $"prev_version".isNotNull || $"prev_nds".isNotNull || $"prev_user".isNotNull)
        .count() === 0, "creates must have an all-null prev side")
      assert(out.where($"id" % 7 =!= 0 && $"prev_version".isNull).count() === 0,
        "edits must carry the prev side")
      // minor versions: prev.version == version (the reference's flag semantics)
      assert(out.where($"minor_version" && ($"prev_version" =!= $"version")).count() === 0)
      // the full drained stream equals the batch mirror row-for-row
      val streamRows = out.orderBy("id").collect().map(_.toSeq).toSeq
      val batchRows = Diffs.frame(spark, 5, 40).orderBy("id").collect().map(_.toSeq).toSeq
      assert(streamRows === batchRows)
    } finally q.stop()
  }

  test("dirty tiles from the diff stream equal the batch mirror; prev tiles included") {
    val zoom = 6
    val batch = DirtyTiles.fromDiffs(Diffs.frame(spark, 5, 40), zoom)
      .as[(Int, Int, Long)].collect().toSet
    assert(batch.nonEmpty)
    // a moved feature dirties BOTH tiles: total changes = creates (1 tile)
    // + edits (2 tiles, possibly the same one twice)
    val n = 5 * 40
    val creates = (0 until n).count(_ % 7 == 0)
    assert(batch.toSeq.map(_._3).sum === (creates + 2L * (n - creates)))

    val q = DirtyTiles.fromDiffs(
      spark.readStream.format("augmented-diffs")
        .option("head", 5).option("batch_size", 2).option("rows_per_sequence", 40)
        .load(), zoom)
      .writeStream.format("memory").queryName("dirty").outputMode("complete")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("dirty").as[(Int, Int, Long)].collect().toSet
      assert(streamed === batch, "streamed dirty-tile counts must equal the batch mirror")
    } finally q.stop()
  }

  test("mapGroupsWithState: per-user running totals carry across micro-batches") {
    val q = ChangesetSessions.userActivity(
      spark.readStream.format("changesets")
        .option("head", 8).option("batch_size", 2).option("rows_per_sequence", 25)
        .load())
      .toDF()
      .writeStream.format("memory").queryName("activity").outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      q.processAllAvailable()
      // multiple micro-batches ran (state really crossed batch boundaries)
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3)
      // LAST update per user == batch-mirror aggregation over the same range
      val w = org.apache.spark.sql.expressions.Window.partitionBy($"user")
      val finals = spark.table("activity")
        .withColumn("best", max($"nChangesets").over(w))
        .where($"nChangesets" === $"best")
        .select($"user", $"nChangesets", $"nComments", $"lastCreatedAt")
        .distinct()
        .as[(String, Long, Long, Long)].collect()
        .map(t => t._1 -> (t._2, t._3, t._4)).toMap
      val expected = Changesets.frame(spark, 8, 25)
        .groupBy($"user")
        .agg(count(lit(1)), sum(size($"comments")).cast("long"), max($"created_at"))
        .as[(String, Long, Long, Long)].collect()
        .map(t => t._1 -> (t._2, t._3, t._4)).toMap
      assert(finals === expected)
    } finally q.stop()
  }

  test("event-time TTL: idle user's state is evicted and a re-arrival restarts from zero") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val input = mem.toDF().toDF("user", "created_at")
      .withColumn("comments",
        expr("CAST(array() AS array<struct<user:string,ts:bigint,text:string>>)"))
    val q = ChangesetSessions.userActivity(input,
      stateTtlSeconds = Some(100), watermarkDelay = "0 seconds")
      .toDF()
      .writeStream.format("memory").queryName("activity_ttl").outputMode("update")
      .start()
    try {
      def step(rows: (String, Long)*): Unit = { mem.addData(rows); q.processAllAvailable() }
      step(("alice", 1000L))          // state: alice(1, ts 1000); timeout at 1100
      step(("bob", 5000L))            // watermark was 1000 -> alice survives; wm advances to 5000
      step(("bob", 6000L))            // wm 5000 > 1100 -> alice EVICTED (final snapshot emitted)
      step(("alice", 7000L))          // re-arrival: state restarts from zero
      val alice = spark.table("activity_ttl")
        .where($"user" === "alice")
        .select($"nChangesets", $"lastCreatedAt")
        .as[(Long, Long)].collect().toSet
      // first arrival, eviction snapshot (same totals), fresh restart —
      // nChangesets would be 2 at ts 7000 if state had survived the idle gap
      assert(alice === Set((1L, 1000L), (1L, 7000L)),
        s"expected eviction + fresh restart, got $alice")
      // bob's state survived (never idle past the TTL between his events)
      val bob = spark.table("activity_ttl").where($"user" === "bob")
        .select($"nChangesets", $"lastCreatedAt").as[(Long, Long)].collect().toSet
      assert(bob === Set((1L, 5000L), (2L, 6000L)))
    } finally q.stop()
  }

  test("session windows + watermark: gap-based comment sessions (batch oracle, streaming append)") {
    // batch mode: full deterministic sessionization of the mirror
    val batch = ChangesetSessions.commentSessions(
      Changesets.frame(spark, 8, 25), gapSeconds = 600)
      .as[(String, java.sql.Timestamp, java.sql.Timestamp, Long)].collect()
      .map { case (u, s, e, n) => (u, s.getTime / 1000, e.getTime / 1000, n) }.toSet
    assert(batch.nonEmpty)
    // hand-built oracle straight from the generator
    val events = (for {
      seq <- 0 until 8; i <- 0 until 25
      c <- Changesets.value(seq, i, 25).comments
    } yield (c.user, c.ts)).groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val oracle = events.flatMap { case (u, ts) =>
      val sessions = scala.collection.mutable.ArrayBuffer.empty[Vector[Long]]
      ts.foreach { t =>
        if (sessions.nonEmpty && t - sessions.last.last < 600) sessions(sessions.length - 1) :+= t
        else sessions += Vector(t)
      }
      sessions.map(s => (u, s.head, s.last + 600, s.length.toLong))
    }.toSet
    assert(batch === oracle)
    // streaming append: emitted sessions are exactly the batch sessions whose
    // close precedes the final watermark (tail sessions stay in state)
    val q = ChangesetSessions.commentSessions(
      spark.readStream.format("changesets")
        .option("head", 8).option("batch_size", 2).option("rows_per_sequence", 25)
        .load(), gapSeconds = 600)
      .writeStream.format("memory").queryName("sessions").outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      q.processAllAvailable()
      val emitted = spark.table("sessions")
        .as[(String, java.sql.Timestamp, java.sql.Timestamp, Long)].collect()
        .map { case (u, s, e, n) => (u, s.getTime / 1000, e.getTime / 1000, n) }.toSet
      assert(emitted.nonEmpty, "watermark must have finalized some sessions")
      assert(emitted.subsetOf(batch), "streaming sessions must agree with the batch oracle")
    } finally q.stop()
  }

  test("streaming aggregation over the source (windowless count by kind)") {
    val q = spark.readStream
      .format("interleaved-docs")
      .option("head", 5)
      .option("rows_per_sequence", 20)
      .load()
      .select(explode($"spans").as("span"))
      .groupBy($"span.kind".as("kind")).count()
      .writeStream.format("memory").queryName("kinds").outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val m = spark.table("kinds").as[(String, Long)].collect().toMap
      assert(m === Map("text" -> 100L, "geo" -> 100L, "image" -> 100L))
    } finally q.stop()
  }
}
