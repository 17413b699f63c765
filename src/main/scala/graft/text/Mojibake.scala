package graft.text

import graft.expressions.MojibakeExpressions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Encoding-artifact (mojibake) detection — the QA signal next to
  * [[graft.expressions.FixMojibake]]'s repair. A UTF-8 document decoded
  * with the wrong single-byte charset leaves a high-precision character
  * signature; counting it per document gives corpora an "encoding
  * health" metric (per-source artifact rates belong on the same D52
  * drift dashboards as quality scores — a crawl source whose artifact
  * rate jumps changed its charset handling, not its content).
  *
  * Everything here is a codegen'd narrow map over built-in functions —
  * length arithmetic on a character-class `regexp_replace`, no UDF, no
  * shuffle, and the identical arithmetic is expressible in any SQL
  * engine (the oracle mirrors it verbatim).
  */
object Mojibake {

  /** The signature class, chosen for precision on web text:
    *  - `Â` (U+00C2) / `Ã` (U+00C3): the misdecode of UTF-8 lead bytes
    *    C2/C3 — every Latin-1-range character (é è ü ñ ° © …) read as
    *    Latin-1/cp1252 produces one of these two;
    *  - U+FFFD: the replacement char a LENIENT decoder already planted
    *    (damage downstream of a different corruption, equally worth
    *    counting);
    *  - C1 controls U+0080–U+009F: the trail bytes of ≥3-byte sequences
    *    (curly quotes, dashes, CJK) under a Latin-1 misdecode — never
    *    legitimate in clean text.
    * Lowercase `â`–`ï` lead-byte forms are deliberately NOT counted
    * alone (genuine French/Portuguese text uses them); their misdecodes
    * are caught through the C1 trail bytes they drag along. */
  // \x{...} escapes parse identically in Java regex and RE2 — the same
  // pattern string runs in Spark and in the DuckDB oracle.
  val artifactClass: String = "[\\x{00C2}\\x{00C3}\\x{FFFD}\\x{0080}-\\x{009F}]"

  /** Number of signature characters in `text` (0 on clean text). */
  def artifactCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, lit(artifactClass), lit("")))).cast("long")

  /** Detection flag: any signature character present. */
  def hasArtifacts(text: Column): Column = artifactCount(text) > 0

  /** The repair (native, self-guarding — see [[graft.expressions.FixMojibake]]). */
  def fix(text: Column): Column = MojibakeExpressions.fixMojibake(text)
}
