package vps.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import vps.text.functions.{hash_uniform, keep_smallest}

/** URL handling + per-domain frequency caps for web-corpus curation.
  *
  * Web-scale training corpora are dominated by a handful of hot domains; the
  * standard cure (C4 / RefinedWeb style) is a deterministic per-domain cap.
  * Everything here is engine-portable: the regexes are LOOKAHEAD-FREE (Java
  * regex and RE2 accept identical pattern strings — the q45/q49 precedent),
  * the domain heuristic is pure array logic, and the cap's randomness is
  * `splitmix64(id ^ salt)` so a kept id stays kept across runs, engines and
  * partitionings.
  *
  * 100-TB shape: extraction and domain parsing are map-side codegen'd
  * builtins. The cap has two implementations proven equivalent by spec:
  * [[domainCapWindow]] (row_number window — one full shuffle of the corpus
  * on domain, the oracle-friendly form) and [[domainCap]] (bounded min-heap
  * aggregate: every map partition keeps at most `cap` (key,id) pairs per
  * domain, so the shuffle carries O(domains * cap * partitions) instead of
  * the corpus, a broadcastable kept-id set comes back, and hot domains never
  * skew a reducer — the scale path).
  */
object UrlOps {

  /** scheme://host[:port][/path] — conservative ASCII, lookahead-free. */
  val UrlPattern: String =
    "https?://[A-Za-z0-9.-]+(:[0-9]+)?(/[A-Za-z0-9._~/?#&=%+-]*)?"

  /** Capture group 1 is the host. */
  val HostPattern: String = "https?://([A-Za-z0-9.-]+)"

  /** All URLs in `text`, in order (group 0 = full matches on both engines —
    * Spark's default group is 1, so the 0 is load-bearing).
    */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit(UrlPattern), lit(0))

  def urlHost(url: Column): Column = regexp_extract(url, HostPattern, 1)

  /** Second-level labels that act as effective TLDs under a 2-letter ccTLD
    * (`example.co.uk` -> registered domain is 3 labels, not 2). A tiny fixed
    * allowlist, not the full public-suffix list — documented heuristic.
    */
  val SecondLevelSuffixes: Seq[String] =
    Seq("ac", "co", "com", "edu", "gov", "net", "org")

  /** Registered domain of a host: last two dot-labels, or last three when
    * the TLD is 2 chars and the label before it is in
    * [[SecondLevelSuffixes]]. Hosts with fewer labels pass through.
    */
  def registeredDomain(host: Column): Column = {
    val parts = split(host, "\\.")
    val n = size(parts)
    val tld = element_at(parts, -1)
    val second = element_at(parts, -2)
    val isMulti = (length(tld) === 2) &&
      second.isin(SecondLevelSuffixes: _*)
    when(n >= 3 && isMulti,
      concat_ws(".", element_at(parts, -3), second, tld))
      .when(n >= 2, concat_ws(".", second, tld))
      .otherwise(host)
  }

  /** Canonical URL for URL-level dedup (C4-style): strip the fragment,
    * lowercase scheme://host, drop default ports (:80 http / :443 https),
    * remove tracking params (utm_*, gclid, fbclid), then tidy a dangling
    * `?`/`&` and a single trailing slash. Fixed rule ORDER is part of the
    * contract. Every rule is a lookahead-free regexp_replace — codegen'd
    * map-side, and the identical patterns run under RE2 (replacements use
    * `$n` in Java vs `\n` + the 'g' flag in DuckDB — syntax, not semantics).
    * Non-URL strings pass through unchanged.
    */
  def normalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    // lowercase scheme://host only (path/query are case-significant)
    val lowered = concat(
      lower(regexp_extract(noFrag, "(?i)^(https?://[^/?#]*)", 1)),
      regexp_replace(noFrag, "(?i)^https?://[^/?#]*", ""))
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(http://[^/:?#]+):80([/?]|$)", "$1$2"),
      "^(https://[^/:?#]+):443([/?]|$)", "$1$2")
    val trackers = "(utm_[A-Za-z]+|gclid|fbclid)=[^&]*"
    val noTrack = regexp_replace(
      regexp_replace(noPort, s"&$trackers", ""),
      s"\\?$trackers&", "?")
    val tidy = regexp_replace(regexp_replace(noTrack, s"\\?$trackers$$", ""), "\\?$", "")
    regexp_replace(tidy, "/$", "")
  }

  /** Exact reference form of the cap: keep the `cap` rows per domain with
    * the smallest `(hash_uniform(id, salt), id)` key. One corpus-wide
    * shuffle on the domain + a per-domain sort — correct, but a hot domain
    * is a hot reducer. Use [[domainCap]] at scale; this form exists as the
    * SQL-mirrorable oracle and the equivalence baseline.
    */
  def domainCapWindow(
      df: DataFrame, domainCol: String, idCol: String,
      cap: Int, salt: Long = 0L): DataFrame = {
    val w = Window.partitionBy(col(domainCol))
      .orderBy(hash_uniform(col(idCol), salt), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= cap)
      .drop("__rn")
  }

  /** Scale form: per-domain bounded min-heap of `(uniform, id)` — partial
    * aggregation caps per-map-partition state at `cap` pairs per domain, the
    * final heaps are O(domains * cap) total, and the kept-id set is exploded
    * and semi-joined back (broadcastable whenever domains * cap is small,
    * which is the entire point of a cap). Same kept set as
    * [[domainCapWindow]] for every (cap, salt) — spec-gated.
    */
  def domainCap(
      df: DataFrame, domainCol: String, idCol: String,
      cap: Int, salt: Long = 0L, broadcastJoinBack: Boolean = true): DataFrame = {
    val kept = df
      .groupBy(col(domainCol))
      .agg(keep_smallest(hash_uniform(col(idCol), salt), col(idCol), cap)
        .as("__keep"))
      .select(explode(col("__keep")).as(idCol))
    // the kept set is <= domains * cap ids regardless of corpus size —
    // broadcastable in the regimes a cap is for. When domains * cap itself
    // is too big for a broadcast, pass false: the semi-join shuffles the
    // (still id-only) kept side and AQE picks the strategy.
    val keptSide = if (broadcastJoinBack) broadcast(kept) else kept
    df.join(keptSide, Seq(idCol), "left_semi")
  }

  /** Per-domain doc counts + kept counts under the cap — the curation audit
    * view (what the cap would drop, by domain).
    */
  def domainCapAudit(
      df: DataFrame, domainCol: String, idCol: String, cap: Int): DataFrame =
    df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("n_kept", least(col("n_docs"), lit(cap.toLong)))
      .withColumn("n_dropped", col("n_docs") - col("n_kept"))
}
