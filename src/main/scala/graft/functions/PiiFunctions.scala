package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data scrubbing — pure
  * codegen'd Column expressions (regexp_count / regexp_replace), no
  * UDFs, so the scrub rides whole-stage codegen across the corpus
  * scan.
  *
  * Patterns deliberately use only the regex subset with identical
  * semantics in Java regex (Spark) and RE2 (DuckDB, used by the
  * oracle): character classes, bounded/greedy quantifiers, \b word
  * boundaries — no lookaround, no backreferences. They are the usual
  * precision/recall trade-off for bulk scrubbing (catch the common
  * shapes; a production pipeline layers validators on top).
  */
object PiiFunctions {

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ssnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val phoneRe = "\\+?\\d[\\d -]{7,}\\d"
  val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def countEmails(c: Column): Column = regexp_count(c, lit(emailRe))
  def countSsns(c: Column): Column = regexp_count(c, lit(ssnRe))
  def countPhones(c: Column): Column = regexp_count(c, lit(phoneRe))
  def countIps(c: Column): Column = regexp_count(c, lit(ipRe))

  /** Replace every PII match with a typed token. Order matters and is
    * part of the contract: email first (its local part may contain
    * digits), then SSN before phone (an SSN is also a valid phone-shaped
    * digit run), then phone, then IP (dots keep IPs out of the phone
    * class, so IP can go last). */
  def redact(c: Column): Column = {
    val e = regexp_replace(c, emailRe, "[EMAIL]")
    val s = regexp_replace(e, ssnRe, "[SSN]")
    val p = regexp_replace(s, phoneRe, "[PHONE]")
    regexp_replace(p, ipRe, "[IP]")
  }
}
