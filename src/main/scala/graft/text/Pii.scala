package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and scrubbing — the redaction pass a training-data
  * pipeline runs before a corpus ships. The same capability family as
  * the reference's field masking (mask.go:23-66) but content-addressed:
  * masking redacts a COLUMN the operator names; scrubbing finds PII
  * *inside* free text.
  *
  * Patterns are deliberately conservative, anchored, and portable: the
  * same regex must behave identically under Java's engine (Spark) and
  * RE2-family engines (the SQL oracle) — so no backreferences, no
  * lookaround, just classes/quantifiers/word-boundaries. Detection
  * counts and replacement are each ONE regexp pass per pattern per row:
  * narrow codegen'd projections, no shuffle, scan-speed at 100 TB.
  *
  * Replacement order is fixed (email → IPv4 → phone) and part of the
  * contract: an email's local part can contain digit runs, so emails
  * are rewritten before the narrower patterns can see their remnants.
  */
object Pii {

  val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val Ipv4Re = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
  val PhoneRe = """\b\d{3}-\d{3}-\d{4}\b"""

  /** The (pattern, replacement-tag) table, in application order. */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("emails", EmailRe, "<EMAIL>"),
    ("ips", Ipv4Re, "<IP>"),
    ("phones", PhoneRe, "<PHONE>"))

  /** Per-row PII hit counts as struct(n_emails, n_ips, n_phones) —
    * counted on the ORIGINAL text (before any replacement). */
  def piiCounts(text: Column): Column =
    struct(Patterns.map { case (name, re, _) =>
      size(regexp_extract_all(text, lit(re), lit(0))).cast("long").as(s"n_$name")
    }: _*)

  /** Text with every PII match replaced by its tag, in [[Patterns]]
    * order. */
  def scrub(text: Column): Column =
    Patterns.foldLeft(text) { case (t, (_, re, tag)) =>
      regexp_replace(t, re, tag)
    }
}
