package vps.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The composed keep/drop decision a pre-training pipeline actually runs —
  * C4/Gopher-style: token-count bounds, duplicate-5-gram repetition,
  * language allowlist, and PII density, evaluated in a FIXED rule order with
  * the first failing rule as the drop reason (so filter stats are
  * attributable). Pure builtin compositions over the existing text kernels —
  * one codegen'd map-side scan, no shuffle; every rule is mirrored exactly by
  * the DuckDB oracle (q22/q45/q46/q49 fragments).
  */
object QualityGate {

  /** Thresholds compare as raw doubles on both sides (exact IEEE mirrors). */
  final case class Config(
      minTokens: Int = 20,
      maxTokens: Int = 90,
      maxRep5: Double = 0.25,
      langs: Seq[String] = Seq("en"),
      maxPiiPerKiloChar: Double = 2.0)

  /** `(idCol, reason, keep)` for every document; `reason` is the FIRST
    * failing rule (`too_short`, `too_long`, `repetitive`, `lang`, `pii`) or
    * `ok`.
    */
  /** Appends `reason` + `keep`, PRESERVING every input column — a stateless
    * projection, so it composes into Structured Streaming plans unchanged
    * (gate-then-dedup on ingest, see StreamingDedupSpec).
    */
  def withGate(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      cfg: Config = Config()): DataFrame = {
    val text = col(textCol)
    val toks = functions.token_count(text)
    val rep5 = functions.char_ngram_repetition(text, 5)
    val lang = functions.lang_id(text)
    val pii: Column =
      (Redact.countEmails(text) + Redact.countPhones(text) + Redact.countIps(text))
        .cast("double") * 1000.0 / length(text).cast("double")
    val reason = when(toks < cfg.minTokens, "too_short")
      .when(toks > cfg.maxTokens, "too_long")
      .when(rep5 >= cfg.maxRep5, "repetitive")
      .when(!lang.isin(cfg.langs: _*), "lang")
      .when(pii >= cfg.maxPiiPerKiloChar, "pii")
      .otherwise("ok")
    docs.withColumn("reason", reason)
      .withColumn("keep", col("reason") === "ok")
  }

  def gate(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      cfg: Config = Config()): DataFrame =
    withGate(docs, idCol, textCol, cfg)
      .select(col(idCol), col("reason"), col("keep"))
}
