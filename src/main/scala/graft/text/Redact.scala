package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction — a first-pass scrub every training-data
  * pipeline runs before text leaves the curation boundary.
  *
  * Patterns are deliberately conservative RE2-compatible regexes (no
  * backreferences, no lookaround) so external engines can re-derive the
  * exact redaction; each is a single codegen'd `regexp_replace` pass.
  * Order matters and is fixed: URLs first (they may contain '@' and
  * digit runs that the narrower patterns would half-match), then
  * emails, phones, IPs. This is pattern-based scrubbing — a production
  * pipeline layers an NER model for names/addresses on top; the
  * pattern tier stays the cheap always-on scan-speed pass.
  */
object Redact {

  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern: String   = "https?://[^ ]+"
  val PhonePattern: String = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val Ipv4Pattern: String  = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** (token, pattern) in application order. */
  val Rules: Seq[(String, String)] = Seq(
    "<URL>" -> UrlPattern,
    "<EMAIL>" -> EmailPattern,
    "<PHONE>" -> PhonePattern,
    "<IP>" -> Ipv4Pattern)

  /** Occurrence count of one pattern. */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Text with every rule's matches replaced by its token, applied in
    * [[Rules]] order. */
  def redactPii(text: Column): Column =
    Rules.foldLeft(text) { case (t, (token, pattern)) =>
      regexp_replace(t, pattern, token)
    }
}
