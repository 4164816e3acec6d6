package vps.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import vps.SparkTestSession

class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mkStream() = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    MemoryStream[(Long, String, Long)]
  }

  test("cross-batch duplicates within the horizon are dropped; first arrival wins") {
    val mem = mkStream()
    val input = mem.toDF().toDF("id", "text", "sec")
      .withColumn("ts", timestamp_seconds($"sec")).drop("sec")
    val q = StreamingDedup.dedupOnIngest(input, watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("dedup_stream")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      def step(rows: (Long, String, Long)*): Unit = { mem.addData(rows); q.processAllAvailable() }
      step((1L, "alpha", 1000L), (2L, "beta", 1010L))
      step((3L, "alpha", 1020L), (4L, "gamma", 1030L)) // dup of id 1, inside horizon
      step((5L, "beta", 1040L)) // dup of id 2, inside horizon
      val ids = spark.table("dedup_stream").select($"id").as[Long].collect().toSet
      assert(ids === Set(1L, 2L, 4L))

      // batch mirror over the SAME rows agrees (deterministic first-arrival)
      val batch = StreamingDedup.dedupOnIngest(
        Seq((1L, "alpha", 1000L), (2L, "beta", 1010L), (3L, "alpha", 1020L),
          (4L, "gamma", 1030L), (5L, "beta", 1040L))
          .toDF("id", "text", "sec")
          .withColumn("ts", timestamp_seconds($"sec")).drop("sec"))
        .select($"id").as[Long].collect().toSet
      assert(batch === ids)
    } finally q.stop()
  }

  test("a duplicate beyond the watermark horizon passes (the documented recall boundary)") {
    val mem = mkStream()
    val input = mem.toDF().toDF("id", "text", "sec")
      .withColumn("ts", timestamp_seconds($"sec")).drop("sec")
    val q = StreamingDedup.dedupOnIngest(input, watermarkDelay = "10 seconds")
      .writeStream.format("memory").queryName("dedup_horizon")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      def step(rows: (Long, String, Long)*): Unit = { mem.addData(rows); q.processAllAvailable() }
      step((1L, "alpha", 1000L))
      step((2L, "filler", 5000L))  // watermark -> 4990, far past 1000: alpha's state evicts
      step((3L, "alpha", 5001L))   // same content, beyond the horizon: passes through
      val byText = spark.table("dedup_horizon")
        .groupBy($"text").agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
      assert(byText("alpha") === 2L, s"beyond-horizon duplicate must pass: $byText")
      assert(byText("filler") === 1L)
      // state really is bounded: the store holds only in-horizon digests
      val lastState = q.lastProgress.stateOperators
      assert(lastState.nonEmpty && lastState.head.numRowsTotal <= 2,
        s"state should hold only in-horizon digests, got ${lastState.head.numRowsTotal}")
    } finally q.stop()
  }

  test("quality gate composes in-stream before dedup (stateless projection + stateful dedup)") {
    import vps.text.QualityGate
    // 20-90 tokens, English stopwords (lang rule), low 5-gram repetition
    val longOk = "the quick brown fox jumps over it and runs to the lazy dog " +
      "that was in for with on park where children play near water under trees"
    val mem = mkStream()
    val input = mem.toDF().toDF("id", "text", "sec")
      .withColumn("ts", timestamp_seconds($"sec")).drop("sec")
    val gated = QualityGate.withGate(input, idCol = "id").where($"keep")
      .select($"id", $"text", $"ts")
    val q = StreamingDedup.dedupOnIngest(gated, watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("gate_dedup_stream")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      def step(rows: (Long, String, Long)*): Unit = { mem.addData(rows); q.processAllAvailable() }
      step((1L, longOk, 1000L), (2L, "too short", 1010L))
      step((3L, longOk, 1020L)) // passes the gate but is a duplicate of id 1
      val ids = spark.table("gate_dedup_stream").select($"id").as[Long].collect().toSet
      assert(ids === Set(1L), s"gate drops 2, dedup drops 3: $ids")

      // the batch mirror of the SAME chain agrees
      val batch = StreamingDedup.dedupOnIngest(
        QualityGate.withGate(
          Seq((1L, longOk, 1000L), (2L, "too short", 1010L), (3L, longOk, 1020L))
            .toDF("id", "text", "sec")
            .withColumn("ts", timestamp_seconds($"sec")).drop("sec"),
          idCol = "id").where($"keep").select($"id", $"text", $"ts"))
        .select($"id").as[Long].collect().toSet
      assert(batch === ids)
    } finally q.stop()
  }

  test("batch mirror breaks first-arrival ties by id") {
    val got = StreamingDedup.dedupOnIngest(
      Seq((9L, "same", 100L), (4L, "same", 100L), (7L, "other", 100L))
        .toDF("id", "text", "sec")
        .withColumn("ts", timestamp_seconds($"sec")).drop("sec"))
      .select($"id").as[Long].collect().toSet
    assert(got === Set(4L, 7L))
  }
}
