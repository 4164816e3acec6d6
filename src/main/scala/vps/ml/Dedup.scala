package vps.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import vps.text.functions._

/** Corpus deduplication operators — each returns a DataFrame program (no
  * collect), so they scale with the cluster:
  *
  * - [[exactDuplicates]]: hash-groupBy (one shuffle on the digest)
  * - [[minhashCandidates]]: MinHash + LSH banding — shuffle on (band, bucket),
  *   candidate pairs verified with exact n-gram Jaccard
  * - [[simhashCandidates]]: 64-bit SimHash, 16-bit band blocking, hamming verify
  *   (builtin `bit_count(a XOR b)`)
  * - [[embeddingNearDuplicates]]: cosine near-dup via coarse quantization
  *   blocking + exact cosine verify
  */
object Dedup {

  /** Groups of byte-identical texts: (digest, keep_id = min id, dup_ids, n). */
  def exactDuplicates(df: DataFrame, idCol: String = "id", textCol: String = "text"): DataFrame =
    df.groupBy(md5(col(textCol)).as("digest"))
      .agg(
        min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n"),
        sort_array(collect_list(col(idCol))).as("ids"))
      .where(col("n") > 1)

  /** MinHash-LSH candidate pairs with exact Jaccard verification.
    *
    * numHashes = bands * rowsPerBand. Collision prob for similarity s is
    * 1-(1-s^rows)^bands; defaults catch s >= ~0.5 with high probability.
    */
  def minhashCandidates(
      df: DataFrame,
      idCol: String = "id",
      textCol: String = "text",
      numHashes: Int = 64,
      bands: Int = 16,
      shingle: Int = 5,
      minJaccard: Double = 0.5): DataFrame = {
    // band buckets computed in one expression pass (see MinHashBands)
    val banded = df.select(col(idCol).as("id"), col(textCol).as("text"),
      posexplode(minhash_bands(col(textCol), numHashes, bands, shingle)).as(Seq("band", "bucket")))

    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("text").as("text_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("text").as("text_b"))
    l.join(r, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("text_a"), col("text_b"))
      .distinct()
      .withColumn("jaccard", ngram_jaccard(col("text_a"), col("text_b"), shingle))
      .where(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash near-duplicate pairs with hamming distance <= maxHamming.
    * Blocking: 4 bands of 16 bits — any pair within hamming 3 shares >= 1 band.
    */
  def simhashCandidates(
      df: DataFrame,
      idCol: String = "id",
      textCol: String = "text",
      maxHamming: Int = 3): DataFrame = {
    val withBands = df.select(col(idCol).as("id"), simhash_bands(col(textCol)).as("sb"))
    val banded = withBands.select(col("id"),
      element_at(col("sb"), 1).as("sig"),
      posexplode(slice(col("sb"), 2, 4)).as(Seq("band", "bucket")))
    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Embedding cosine near-duplicates. Blocking on the sign pattern of the first
    * `signBits` dimensions (a fixed random-hyperplane LSH with axis-aligned
    * planes); verify with exact cosine.
    */
  def embeddingNearDuplicates(
      df: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      minCosine: Double = 0.95,
      signBits: Int = 8): DataFrame = {
    val keyed = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      aggregate(
        zip_with(slice(col(vecCol), 1, signBits),
          sequence(lit(0), lit(signBits - 1)),
          (x, i) => when(x >= 0, call_function("shiftleft", lit(1L), i.cast("int"))).otherwise(lit(0L))),
        lit(0L), (acc, x) => acc + x).as("bucket"))
    val l = keyed.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val r = keyed.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine_sim(col("v_a"), col("v_b")))
      .where(col("cosine") >= minCosine)
      .select("id_a", "id_b", "cosine")
  }
}
