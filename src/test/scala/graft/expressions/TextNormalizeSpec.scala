package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextNormalizeSpec extends SparkSpec {
  import spark.implicits._

  /** The equivalent staged regex chain (what the DuckDB oracle replays):
    * char maps, then `[ \t]+`->` `, ` *\n *`->`\n`, `\n{3,}`->`\n\n`,
    * trim of spaces/newlines. */
  private def reference(s: String): String = {
    val removed = (0x00 to 0x08).map(_.toChar).toSet ++
      (0x0E to 0x1F).map(_.toChar) ++
      Set('\u007f', '\u200b', '\u200c', '\u200d', '\ufeff')
    val uniSpace = Set('\u00a0', '\u1680', '\u202f', '\u205f', '\u3000') ++
      ('\u2000' to '\u200a')
    val mapped = s.replace("\r\n", "\n").flatMap {
      case c if c == '\r' || c == '\u0085' || c == '\u2028' || c == '\u2029' => "\n"
      case '\u2026' => "..."
      case c if removed(c) => ""
      case c if uniSpace(c) => " "
      case '\u2018' | '\u2019' | '\u201a' | '\u201b' => "'"
      case '\u201c' | '\u201d' | '\u201e' | '\u201f' => "\""
      case '\u2010' | '\u2011' | '\u2012' | '\u2013' | '\u2014' | '\u2015' | '\u2212' => "-"
      case c => c.toString
    }
    mapped.replaceAll("[ \t]+", " ")
      .replaceAll(" *\n *", "\n")
      .replaceAll("\n{3,}", "\n\n")
      .replaceAll("^[ \n]+|[ \n]+$", "")
  }

  private def run(ss: Seq[String]): Seq[String] =
    ss.toDF("t").select(TextExpressions.textNormalize(col("t")).as("n"))
      .as[String].collect().toSeq

  test("hand cases: quotes, dashes, nbsp, controls, ellipsis, newline runs") {
    val cases = Seq(
      "\u201chello\u201d \u2014 it\u2019s fine\u2026",
      "  leading and trailing  ",
      "a\u00a0b\u3000c",
      "zero\u200bwidth\ufeffgone",
      "ctrl\u0007char\u0001out",
      "a \t b\t\tc",
      "one\n\n\n\n\ntwo",
      "win\r\ndows\rmac\u0085ls",
      "sp \n ace\n \n\n around",
      "\n\n\nstart and end\n \n",
      "", " ", "\n", "\u2026")
    assert(run(cases) === cases.map(reference))
  }

  test("property: matches the staged regex chain on random special-heavy strings") {
    val alphabet = "ab c\t\n\r\u00a0\u2018\u2019\u201c\u201d\u2013\u2014\u2026\u200b\u2028.!"
    val rnd = new scala.util.Random(7)
    val cases = Seq.fill(300)(
      (0 until rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    assert(run(cases) === cases.map(reference))
  }

  test("null propagates") {
    val got = Seq[Option[String]](None, Some("a  b")).toDF("t")
      .select(TextExpressions.textNormalize(col("t")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(got === Array(null, "a b"))
  }

  test("idempotent: normalizing twice is the identity") {
    val cases = Seq("a b\n\n\n\nc \u201cq\u201d", "  x\t y\u2026 ")
    val once = run(cases)
    assert(run(once) === once)
  }
}
