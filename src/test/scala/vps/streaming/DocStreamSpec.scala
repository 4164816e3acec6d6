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
