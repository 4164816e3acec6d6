package vps.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import vps.text.functions.char_shingles

/** Benchmark decontamination: flag training documents that share long char
  * n-grams with an evaluation set (the GPT-3-style exact-overlap practice —
  * eval text leaking into training data inflates benchmark scores, so
  * pipelines drop or audit the overlapping docs before training).
  *
  * 100-TB shape: the EVAL side is small (benchmarks are thousands of docs) —
  * its distinct n-gram hash set is broadcast; the TRAIN side streams map-side
  * through explode -> broadcast semi-probe -> partial count, so the only
  * shuffle is the final per-doc count aggregation over HIT rows (contaminated
  * docs only, a tiny fraction of the corpus). Nothing driver-side scales with
  * the training corpus. n-grams travel as 8-byte splitmix64 hashes, never as
  * strings.
  */
object Decontam {

  /** `(id, n_hits)` for every training doc sharing >= 1 distinct char
    * `n`-gram with `eval`; `n_hits` counts the doc's DISTINCT overlapping
    * n-grams. Docs with no overlap are absent (join semantics — the common
    * case at scale).
    */
  def contaminatedDocs(
      train: DataFrame,
      eval: DataFrame,
      idCol: String = "id",
      textCol: String = "text",
      n: Int = 13): DataFrame = {
    val evalGrams = eval
      .select(explode(char_shingles(col(textCol), n)).as("g"))
      .distinct()
    val trainGrams = train
      .select(col(idCol).as("id"), explode(char_shingles(col(textCol), n)).as("g"))
    // char_shingles already dedups within a doc, so (id, g) is distinct
    // without a pre-aggregation pass
    trainGrams
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hits"))
  }
}
