package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-pipeline operators for training-data preparation: PII
  * redaction and keyed pseudonymization with small-cohort suppression.
  *
  * The reference corpus carries personal observation data (observer
  * names/emails in ningaloo-etl.Rmd:214-220 survey frames); a corpus
  * headed for model training must scrub such identifiers at scale. Both
  * operators are single-pass narrow projections + one keyed aggregate —
  * no shuffle beyond the group-by, so they hold at 100 TB.
  *
  * The synthetic `documents` table contains no PII, so the registered
  * query seeds deterministic PII spans (derived only from `doc_id`, so
  * DuckDB reproduces them exactly) before scrubbing — the seeding is the
  * fixture, the scrub is the operator under test.
  */
object Privacy {

  /** RE2- and java.util.regex-compatible patterns (no backrefs, no
    * lookaround) so the DuckDB oracle runs the very same regexes. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** Deterministic PII fixture: docs with id % 3 != 2 get one email, one
    * IPv4 and one phone appended, all derived from the id. The remaining
    * third stays clean, exercising the zero-redaction path. */
  def seedPii(text: Column, id: Column): Column =
    when(id % 3 =!= 2,
      concat(text, lit(" contact u"), id, lit("@ex.org via 10."),
        id % 256, lit(".0."), (id * 7) % 256,
        lit(" tel 555-"), lit(1000L) + (id % 9000)))
      .otherwise(text)

  /** Redact emails -> `<EMAIL>`, IPv4 -> `<IP>`, phones -> `<PHONE>`,
    * in that order (match counts are taken on the original text). */
  def scrubText(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipRe, "<IP>"),
      phoneRe, "<PHONE>")

  /** Per-document redaction report: match counts per PII class plus the
    * digest of the scrubbed text (digest, not text, so the verified
    * output stays narrow while still pinning every redacted byte). */
  def scrubReport(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      regexp_count(t, lit(emailRe)).cast("long").as("n_emails"),
      regexp_count(t, lit(ipRe)).cast("long").as("n_ips"),
      regexp_count(t, lit(phoneRe)).cast("long").as("n_phones"),
      md5(scrubText(t)).as("scrub_hash"))
  }

  /** Keyed pseudonymization: stable, irreversible-without-pepper surrogate
    * id for a subject column (first 16 hex chars of SHA-256 over
    * pepper || id). The same subject always maps to the same surrogate,
    * so per-user grouping still works downstream. */
  def pseudonym(id: Column, pepper: String): Column =
    substring(sha2(concat(lit(pepper + ":"), id.cast("string")), 256), 1, 16)

  /** Pseudonymized per-subject activity with small-cohort suppression:
    * subjects with fewer than `k` rows collapse into one `<suppressed>`
    * bucket, so no released row describes a group smaller than k. One
    * hash-aggregate by subject, one tiny re-aggregate — scale-safe. */
  def kSuppressedActivity(df: DataFrame, subjectCol: String, pepper: String,
      k: Int): DataFrame = {
    val per = df.groupBy(pseudonym(col(subjectCol), pepper).as("uid"))
      .agg(count(lit(1)).as("n"))
    per.groupBy(when(col("n") >= k, col("uid")).otherwise(lit("<suppressed>"))
        .as("subject"))
      .agg(sum(col("n")).as("n_events"), count(lit(1)).as("n_subjects"))
  }
}
