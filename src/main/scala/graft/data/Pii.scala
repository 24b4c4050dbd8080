package graft.data

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines: emails, IPv4
  * addresses, and US-style phone numbers via deliberately simple regexes
  * that behave identically under Java regex (Spark) and RE2-family engines
  * (no lookarounds, no backreferences, ASCII classes only) — counts and
  * redacted output are reproducible across engines. All scan-local
  * codegen'd expressions (`regexp_count`/`regexp_replace`): at 100 TB this
  * annotates/redacts in the same pass as other quality signals, no
  * shuffle, no UDF.
  */
object Pii {

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
  val phoneRe = "\\b\\d{3}-\\d{4}\\b"

  def emailCount(c: Column): Column = regexp_count(c, lit(emailRe))
  def ipv4Count(c: Column): Column = regexp_count(c, lit(ipv4Re))
  def phoneCount(c: Column): Column = regexp_count(c, lit(phoneRe))

  /** Emails → <EMAIL>, then IPv4 → <IP>, then phones → <PHONE> (fixed
    * order so overlapping matches resolve identically everywhere). */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")
}
