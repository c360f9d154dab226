package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-corpus hygiene: emails,
  * NANP-style phone numbers, and IPv4 addresses are counted and replaced
  * with typed placeholder tags.
  *
  * Pure `Column` expressions over `regexp_extract_all`/`regexp_replace` —
  * map-only, codegen'd, one scan at any corpus size. The patterns stick to
  * the regex subset Java and RE2 interpret identically (no backrefs, no
  * lookaround), so the whole scrub is oracle-checkable cross-engine.
  *
  * Scrub order matters and is fixed: emails first (their host part could
  * otherwise be chewed up by the later numeric patterns), then phones,
  * then IPs.
  */
object Redact {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val Ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def countMatches(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0))).cast("long")

  def emailCount(c: Column): Column = countMatches(c, EmailRe)
  def phoneCount(c: Column): Column = countMatches(c, PhoneRe)
  def ipv4Count(c: Column): Column  = countMatches(c, Ipv4Re)

  /** Replace every PII match with its typed tag. */
  def scrub(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "[EMAIL]"),
        PhoneRe, "[PHONE]"),
      Ipv4Re, "[IP]")
}
