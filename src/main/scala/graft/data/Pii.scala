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

  /** k-anonymity audit (Sweeney IJUFKS 2002): group the frame by its
    * quasi-identifier columns and flag every equivalence class smaller
    * than k — rows in those classes are re-identifiable by an adversary
    * who knows the quasi-identifiers, so a release pipeline must suppress
    * or generalize them. One keyed aggregate with map-side partial counts;
    * the QI tuple is the shuffle key, so the audit costs the same as any
    * GROUP BY at 100 TB and the per-class output is bounded by the QI
    * domain, not the row count. */
  def kAnonymity(df: org.apache.spark.sql.DataFrame, qiCols: Seq[String],
                 k: Int): org.apache.spark.sql.DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("group_k"))
      .withColumn("at_risk", col("group_k") < k)
}
