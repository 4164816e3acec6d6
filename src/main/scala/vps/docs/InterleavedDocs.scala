package vps.docs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The engine's input table (north rule / input_hint):
  * `(doc_id: string, spans: array<struct<kind:string, text:string, media_ref:string, offset:int>>)`
  * — interleaved text + geo + media spans per document.
  *
  * Built deterministically from the driver's `documents.parquet` with pure
  * column arithmetic so every derived value is reproducible in ANSI SQL
  * (the DuckDB oracle recomputes the same lon/lat formulas).
  *
  * Span layout per doc (id = numeric doc_id):
  *   offset 0: kind='text'  text = documents.text
  *   offset 1: kind='geo'   text = 'POINT (<lon> <lat>)'
  *              lon = (id*9973  % 3600000)/10000.0 - 180.0
  *              lat = (id*6151  % 1600000)/10000.0 -  80.0
  *   offset 2: kind='image' media_ref = 'img://<id>'
  *   offset 3 (id % 3 == 0): kind='geo' second point
  *              lon2 = ((id*7919 + 104729) % 3600000)/10000.0 - 180.0
  *              lat2 = ((id*4093 + 15485)  % 1600000)/10000.0 -  80.0
  */
object InterleavedDocs {

  def lonExpr(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (id * 9973L % 3600000L) / 10000.0 - 180.0
  def latExpr(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (id * 6151L % 1600000L) / 10000.0 - 80.0
  def lon2Expr(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    ((id * 7919L + 104729L) % 3600000L) / 10000.0 - 180.0
  def lat2Expr(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    ((id * 4093L + 15485L) % 1600000L) / 10000.0 - 80.0

  /** SQL fragments for the DuckDB oracle (identical formulas). */
  val lonSql = "(doc_id * 9973 % 3600000) / 10000.0 - 180.0"
  val latSql = "(doc_id * 6151 % 1600000) / 10000.0 - 80.0"
  val lon2Sql = "((doc_id * 7919 + 104729) % 3600000) / 10000.0 - 180.0"
  val lat2Sql = "((doc_id * 4093 + 15485) % 1600000) / 10000.0 - 80.0"

  private def span(kind: String, text: org.apache.spark.sql.Column,
      mediaRef: org.apache.spark.sql.Column, offset: Int) =
    struct(lit(kind).as("kind"), text.as("text"), mediaRef.as("media_ref"), lit(offset).as("offset"))

  private def wktPoint(lon: org.apache.spark.sql.Column, lat: org.apache.spark.sql.Column) =
    // %.4f (exact for the 1e-4-grid coordinates) — a plain double cast can emit
    // scientific notation, which WKT readers reject
    concat(lit("POINT ("), format_string("%.4f", lon), lit(" "), format_string("%.4f", lat), lit(")"))

  /** Interleaved docs derived from `<sfDir>/documents.parquet`.
    *
    * `replication` > 1 scales the table for benchmarks: copy r of doc d gets
    * id = d * replication + r (still deterministic). Column `id` (numeric) is
    * kept alongside the string `doc_id` for joins; drop it for the pure shape.
    */
  def fromDocuments(spark: SparkSession, sfDir: String, replication: Int = 1): DataFrame = {
    // spread the (few) base docs across all cores BEFORE the replication
    // explode: the test-SF parquet is one file = one input split, and an
    // explode upstream of any exchange would synthesize the whole replicated
    // corpus in a single task. Gated on the actual scan layout (like
    // SparkEntry.docsT): a production-scale table already splits into >=
    // parallelism partitions and must not pay a full-corpus shuffle here.
    val scan = spark.read.parquet(s"$sfDir/documents.parquet")
    val parallelism = spark.sparkContext.defaultParallelism
    // split-count probe WITHOUT materializing an RDD lineage on the driver
    // (scan yields ~ceil(bytes / maxPartitionBytes) input splits)
    val maxSplitBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val scanBytes = scan.queryExecution.optimizedPlan.stats.sizeInBytes
    val base =
      if (scanBytes < BigInt(maxSplitBytes) * parallelism) scan.repartition(parallelism) else scan
    val replicated =
      if (replication == 1) base.withColumn("id", col("doc_id").cast("long"))
      else base
        .withColumn("r", explode(lit((0 until replication).toArray)))
        .withColumn("id", col("doc_id").cast("long") * replication + col("r"))
        .drop("r")
    val nullStr = lit(null).cast("string")
    replicated.select(
      concat(lit("doc"), col("id")).as("doc_id"),
      col("id"),
      when(col("id") % 3 === 0,
        array(
          span("text", col("text"), nullStr, 0),
          span("geo", wktPoint(lonExpr(col("id")), latExpr(col("id"))), nullStr, 1),
          span("image", nullStr, concat(lit("img://"), col("id")), 2),
          span("geo", wktPoint(lon2Expr(col("id")), lat2Expr(col("id"))), nullStr, 3)))
        .otherwise(
          array(
            span("text", col("text"), nullStr, 0),
            span("geo", wktPoint(lonExpr(col("id")), latExpr(col("id"))), nullStr, 1),
            span("image", nullStr, concat(lit("img://"), col("id")), 2)))
        .as("spans"))
  }

  /** [[fromDocuments]] composed with [[extractGeoSpans]], algebraically fused
    * for this generator: same output rows `(doc_id, id, span_offset, geom)`,
    * but the span structs are never built, the full document text is never
    * read (the scan prunes to `doc_id`), and the WKT format/parse round trip
    * is gone — the point geometry comes straight from the closed-form
    * coordinates. The coordinate arithmetic is IDENTICAL to the formulas the
    * SQL oracle recomputes (bit-exact, DocsSpec-gated); the WKT
    * format/parse round trip of the span path drifts from that closed form
    * by a few ulps — never across a discretization boundary, boundary
    * values being exactly representable — so the two paths agree on every
    * derived/rounded value while differing in last-ulp raw bits
    * (DocsSpec bounds the drift). Use for query pipelines
    * that only consume geo spans; [[extractGeoSpans]] stays the generic path
    * for arbitrary span frames.
    */
  def geoSpansDirect(spark: SparkSession, sfDir: String, replication: Int = 1): DataFrame = {
    import vps.sql.functions.st_point
    val scan = spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"))
    val parallelism = spark.sparkContext.defaultParallelism
    val maxSplitBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val scanBytes = scan.queryExecution.optimizedPlan.stats.sizeInBytes
    // unlike fromDocuments, the per-row work here is a few integer ops + one
    // point constructor — nothing worth an up-front corpus exchange; the
    // spread gate only matters when a replication explode amplifies a
    // single-split scan inside one task (measured: dropping the exchange at
    // replication=1 saves 0.1-0.2 s on EVERY geo query at bench SF, and a
    // production-scale table splits past `parallelism` on its own)
    val base =
      if (replication > 1 && scanBytes < BigInt(maxSplitBytes) * parallelism)
        scan.repartition(parallelism)
      else scan
    val replicated =
      if (replication == 1) base.withColumn("id", col("doc_id").cast("long"))
      else base
        .withColumn("r", explode(lit((0 until replication).toArray)))
        .withColumn("id", col("doc_id").cast("long") * replication + col("r"))
        .drop("r")
    val p1 = struct(lit(1).as("span_offset"),
      st_point(lonExpr(col("id")), latExpr(col("id"))).as("geom"))
    val p2 = struct(lit(3).as("span_offset"),
      st_point(lon2Expr(col("id")), lat2Expr(col("id"))).as("geom"))
    replicated.select(col("id"),
        explode(when(col("id") % 3 === 0, array(p1, p2)).otherwise(array(p1))).as("s"))
      .select(
        concat(lit("doc"), col("id")).as("doc_id"),
        col("id"),
        col("s.span_offset").as("span_offset"),
        col("s.geom").as("geom"))
  }

  /** Explode geo spans to one row per geometry: (doc_id, id, span_offset, geom).
    * Span order inside a doc is recoverable from span_offset (G6; the explode
    * itself preserves array order, but downstream shuffles may not — offset is
    * the durable order key).
    */
  def extractGeoSpans(docs: DataFrame): DataFrame = {
    import vps.sql.functions.st_geomFromWKT
    docs
      .select(col("doc_id"), col("id"), posexplode(col("spans")).as(Seq("pos", "span")))
      .where(col("span.kind") === "geo")
      .select(
        col("doc_id"), col("id"),
        col("span.offset").as("span_offset"),
        st_geomFromWKT(col("span.text")).as("geom"))
  }

  /** Text spans only: (doc_id, id, span_offset, text). */
  def extractTextSpans(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("id"), explode(col("spans")).as("span"))
      .where(col("span.kind") === "text")
      .select(col("doc_id"), col("id"), col("span.offset").as("span_offset"),
        col("span.text").as("text"))

  /** Canonical fingerprint of the per-row span sequence (kind, text, media_ref,
    * order) — equality of this fingerprint before/after a transform is the
    * north-rule invariant check.
    */
  def spanFingerprint(spans: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sha2(to_json(array_sort(spans, (a, b) =>
      when(a.getField("offset") < b.getField("offset"), -1)
        .when(a.getField("offset") > b.getField("offset"), 1)
        .otherwise(0))), 256)
}
