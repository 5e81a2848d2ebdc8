package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction over text columns — a compliance pass
  * every large-scale training-data pipeline runs before anything else
  * (strip emails / network addresses / government-ID shapes from crawl
  * text).
  *
  * Patterns are deliberately RE2-compatible (explicit character
  * classes, no lookaround, no backreferences) so the same pattern
  * strings run identically under Java regex (Spark codegen) and
  * RE2-based engines (external oracles). Everything is a pure column
  * expression — `regexp_count` / chained `regexp_replace` stay inside
  * whole-stage codegen, no UDFs on the scan path.
  */
object Pii {

  /** Email addresses (practical shape, case-insensitive via explicit
    * classes).
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (shape match; octet range checking is a
    * verification concern, not a scan concern).
    */
  val ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** US-SSN-shaped ddd-dd-dddd runs. */
  val ssnPattern = "[0-9]{3}-[0-9]{2}-[0-9]{4}"

  def countEmails(text: Column): Column = regexp_count(text, lit(emailPattern))
  def countIpv4(text: Column): Column = regexp_count(text, lit(ipv4Pattern))
  def countSsn(text: Column): Column = regexp_count(text, lit(ssnPattern))

  /** Redact all three PII shapes with typed placeholders. Order
    * matters and is part of the contract: emails first (an email's
    * local part may contain digit runs), then IPv4, then SSN.
    */
  def redact(text: Column): Column = {
    val e = regexp_replace(text, emailPattern, "<EMAIL>")
    val i = regexp_replace(e, ipv4Pattern, "<IP>")
    regexp_replace(i, ssnPattern, "<SSN>")
  }

  /** Per-row PII report: match counts per shape, a `has_pii` verdict,
    * and a fingerprint of the redacted text (the redacted payload
    * itself stays in the pipeline; the fingerprint is what audits
    * compare).
    *
    * Counts mirror the redaction chain exactly: `n_ip` is counted on
    * the email-redacted text and `n_ssn` on the email+IP-redacted
    * text, so each count equals the number of placeholders `redact`
    * emits for that shape (a dotted-quad inside an email local part is
    * an email, not an IP).
    */
  def scan(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val afterEmail = regexp_replace(col(textCol), emailPattern, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, ipv4Pattern, "<IP>")
    df.select(col(idCol),
      countEmails(col(textCol)).cast("long").as("n_email"),
      countIpv4(afterEmail).cast("long").as("n_ip"),
      countSsn(afterIp).cast("long").as("n_ssn"),
      md5(regexp_replace(afterIp, ssnPattern, "<SSN>")).as("redacted_fp"))
      .withColumn("has_pii", col("n_email") + col("n_ip") + col("n_ssn") > 0)
  }
}
