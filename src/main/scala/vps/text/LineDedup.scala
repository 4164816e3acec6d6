package vps.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level boilerplate removal (the CCNet / RefinedWeb practice): a line
  * that appears in many documents (cookie banners, nav bars, license headers)
  * is boilerplate; drop it from every document while preserving each
  * document's remaining line order.
  *
  * 100-TB shape: lines explode map-side; the line-frequency rollup shuffles
  * DISTINCT (line, doc) pairs once with map-side partial combine; the
  * boilerplate set (lines with df >= threshold) is by construction the
  * heavy-hitter tail — small — and broadcasts into a left-anti join, so the
  * corpus-sized side never reshuffles for the filter; reassembly is one
  * exchange on the doc id with per-group state bounded by document size.
  */
object LineDedup {

  /** Per-(doc, pos, line) rows; empty lines kept (they carry structure). */
  def explodeLines(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))

  /** Lines whose DOCUMENT frequency (distinct docs containing the line)
    * reaches `minDocFreq`.
    */
  def boilerplateLines(lines: DataFrame, idCol: String, minDocFreq: Long): DataFrame =
    lines.select(col("line"), col(idCol)).distinct()
      .groupBy(col("line")).agg(count(lit(1)).as("df"))
      .where(col("df") >= minDocFreq)

  /** Documents with boilerplate lines removed: (id, text, n_kept, n_dropped).
    * Line order inside each document is preserved; documents whose every
    * line was boilerplate come back with empty text (n_kept = 0).
    *
    * The anti-join against the boilerplate set is deliberately UNHINTED: the
    * df >= minDocFreq line set is NOT bounded by a constant (every common
    * sentence qualifies as the corpus grows — at web scale it is billions of
    * lines), so a forced broadcast is a driver OOM waiting to happen. The
    * boilerplate side sits behind its aggregation exchange, so AQE sees its
    * ACTUAL runtime size and picks the broadcast anti-join whenever it fits
    * (the test-SF plan is unchanged) and a shuffled anti-join when it does
    * not — the size-gated fallback with the gate evaluated on real bytes
    * rather than a driver-side probe action. Both paths are byte-identical
    * (LineDedupSpec forces the shuffled plan and compares).
    */
  def dropBoilerplate(
      df: DataFrame, idCol: String, textCol: String, minDocFreq: Long): DataFrame = {
    val lines = explodeLines(df, idCol, textCol)
    val boiler = boilerplateLines(lines, idCol, minDocFreq)
    val kept = lines.join(boiler.select(col("line")), Seq("line"), "left_anti")
    val reassembled = kept
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("pos"), col("line")))).as("ordered"))
      .select(col(idCol),
        array_join(transform(col("ordered"), _.getField("line")), "\n").as(textCol),
        size(col("ordered")).cast("long").as("n_kept"))
    val totals = df.select(col(idCol),
      size(split(col(textCol), "\n")).cast("long").as("n_total"))
    // left join from totals: docs reduced to nothing still come back
    totals.join(reassembled, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col(textCol), lit("")).as(textCol),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_total") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }
}
