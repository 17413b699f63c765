package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

class MojibakeSpec extends SparkSpec {
  import spark.implicits._

  private def fixOne(s: String): String =
    Seq(s).toDF("t").select(Mojibake.fix(col("t"))).as[String].collect().head

  private def latin1Corrupt(s: String): String =
    new String(s.getBytes(UTF_8), ISO_8859_1)

  private def cp1252Corrupt(s: String): String =
    new String(s.getBytes(UTF_8), java.nio.charset.Charset.forName("windows-1252"))

  test("fix inverts a Latin-1 misdecode exactly") {
    val original = "Café — déjà vu, naïve réunion für 10°C"
    assert(fixOne(latin1Corrupt(original)) == original)
  }

  test("fix inverts a cp1252 misdecode (curly quotes through the € ™ specials)") {
    val original = "It’s ‘fine‘ — really… €5"
    val corrupt = cp1252Corrupt(original)
    assert(corrupt.contains("â€™"), "sanity: the classic signature is present")
    assert(fixOne(corrupt) == original)
  }

  test("a cp1252 misdecode through an UNDEFINED byte is detectable but not invertible") {
    // U+201D ends in byte 9D — undefined in cp1252, so the decoder
    // already destroyed it to U+FFFD; repair must leave the string
    // alone (never guess), and the detector must still flag it.
    val corrupt = cp1252Corrupt("a “quoted” bit")
    assert(corrupt.contains("�"))
    assert(fixOne(corrupt) == corrupt)
    val flagged = Seq(corrupt).toDF("t")
      .select(Mojibake.hasArtifacts(col("t"))).collect().head.getBoolean(0)
    assert(flagged)
  }

  test("fix round-trips CJK and emoji misdecodes (3- and 4-byte sequences)") {
    val original = "日本語 text 🙂 mixed"
    assert(fixOne(latin1Corrupt(original)) == original)
  }

  test("fix leaves genuine accented text, ASCII, CJK, and null untouched") {
    assert(fixOne("Café réunion") == "Café réunion", "real Latin-1 text: E9 is not valid UTF-8")
    assert(fixOne("plain ascii stays") == "plain ascii stays")
    assert(fixOne("日本語そのまま") == "日本語そのまま", "unmappable chars → not a misdecode")
    assert(fixOne("price — 5€ (real dash and euro)") == "price — 5€ (real dash and euro)")
    val n = Seq((1, null: String)).toDF("i", "t").select(Mojibake.fix(col("t"))).collect().head
    assert(n.isNullAt(0))
  }

  test("fix is idempotent and safe on partial corruption") {
    val corrupt = latin1Corrupt("déjà vu")
    assert(fixOne(fixOne(corrupt)) == fixOne(corrupt))
    // corruption mixed with genuine multi-byte text → whole-string
    // re-encode fails → untouched (never half-repair)
    val mixed = "Ã© but also 中"
    assert(fixOne(mixed) == mixed)
  }

  test("fix matches the charset-machinery reference on random corpora") {
    val rnd = new scala.util.Random(7)
    // whole code points, so random concatenation never splits a
    // surrogate pair into invalid UTF-16
    val pieces = Seq("a", "é", "√", "ü", "—", "…", "日", "🙂", "e", " ", "ñ", "’")
    val originals = (1 to 200).map { _ =>
      (1 to (1 + rnd.nextInt(30))).map(_ => pieces(rnd.nextInt(pieces.length))).mkString
    }
    originals.foreach { s =>
      val corrupt = latin1Corrupt(s)
      val got = fixOne(corrupt)
      assert(got == s, s"latin1 round-trip failed for ${s.toList}")
    }
  }

  test("artifactCount counts the signature class; clean text scores 0") {
    val rows = Seq(
      ("CafÃ© visit", 1L), // Ã
      (latin1Corrupt("It’s"), 2L), // E2 80 99 → â + two C1 controls
      ("clean english text", 0L),
      ("Café réunion", 0L), // genuine accents are NOT artifacts
      ("broken � char", 1L))
    rows.zipWithIndex.foreach { case ((text, want), i) =>
      val got = Seq(text).toDF("t").select(Mojibake.artifactCount(col("t"))).as[Long].collect().head
      assert(got == want, s"case $i '$text': got $got want $want")
    }
  }

}
