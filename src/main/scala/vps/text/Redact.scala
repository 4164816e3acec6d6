package vps.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: detect + redact emails, phone numbers,
  * and IPv4 addresses before text reaches a model.
  *
  * All patterns are LOOKAHEAD-FREE and backreference-free, so Java's regex
  * engine (Spark) and RE2 (DuckDB) accept the IDENTICAL pattern strings and
  * produce identical matches (the q45 BPE-tokenizer precedent). Everything
  * here is builtin `regexp_*` composition — whole-stage codegen'd, map-side
  * only, no shuffle: the 100-TB shape is a pure scan.
  */
object Redact {
  /** user@host.tld — conservative ASCII form. */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(\\.[A-Za-z0-9-]+)*\\.[A-Za-z]{2,}"

  /** International-ish phone: optional +CC, then 3 separated digit groups. */
  val PhonePattern: String = "\\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}"

  /** Dotted-quad IPv4 (syntactic — no octet range check, like most scrubbers). */
  val Ipv4Pattern: String = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  val EmailToken = "<EMAIL>"
  val PhoneToken = "<PHONE>"
  val IpToken = "<IP>"

  /** Replacement order is part of the contract (a phone fragment can look
    * like an IP once digits are rewritten): email, then phone, then IP —
    * mirrored verbatim by the SQL oracle.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, EmailToken),
        PhonePattern, PhoneToken),
      Ipv4Pattern, IpToken)

  def countEmails(text: Column): Column = regexp_count(text, lit(EmailPattern))
  def countPhones(text: Column): Column = regexp_count(text, lit(PhonePattern))
  def countIps(text: Column): Column = regexp_count(text, lit(Ipv4Pattern))
}
