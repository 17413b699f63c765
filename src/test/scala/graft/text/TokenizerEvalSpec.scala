package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TokenizerEvalSpec extends SparkSpec {
  import spark.implicits._

  test("fertility separates the in-vocab language from the uncovered script") {
    // model knows English-ish pieces; Cyrillic is entirely out of vocab
    val model = UnigramTokenizer.Model(
      Map("hello" -> math.log(0.3), "world" -> math.log(0.3),
        "h" -> math.log(0.05), "e" -> math.log(0.05), "l" -> math.log(0.05),
        "o" -> math.log(0.05), "w" -> math.log(0.05), "r" -> math.log(0.05),
        "d" -> math.log(0.05)),
      maxPieceLen = 5, unkLogp = -100.0)
    val docs = Seq(
      ("en", "hello world hello"),
      ("ru", "привет мир")).toDF("lang", "text")
    val out = TokenizerEval.report(docs, col("text"), col("lang"), model)
      .collect().map(r => r.getAs[String]("slice") -> r).toMap

    val en = out("en")
    assert(en.getAs[Long]("n_words") == 3 && en.getAs[Long]("n_pieces") == 3,
      "whole-word pieces → fertility 1")
    assert(math.abs(en.getAs[Double]("fertility") - 1.0) < 1e-12)
    assert(en.getAs[Long]("unk_pieces") == 0)

    val ru = out("ru")
    assert(ru.getAs[Long]("n_words") == 2)
    assert(ru.getAs[Long]("n_pieces") == 9, "uncovered script → one piece per char")
    assert(math.abs(ru.getAs[Double]("fertility") - 4.5) < 1e-12)
    assert(ru.getAs[Long]("unk_pieces") == 9 &&
      math.abs(ru.getAs[Double]("unk_share") - 1.0) < 1e-12)
  }

  test("word frequency weights the report (distinct-word segmentation, corpus-weighted)") {
    val model = UnigramTokenizer.Model(
      Map("ab" -> math.log(0.5), "a" -> math.log(0.25), "b" -> math.log(0.25)),
      maxPieceLen = 2, unkLogp = -100.0)
    // "ab" ×9 (1 piece each), "ba" ×1 (2 pieces: b a)
    val docs = Seq(("x", (Seq.fill(9)("ab") :+ "ba").mkString(" "))).toDF("s", "text")
    val out = TokenizerEval.report(docs, col("text"), col("s"), model).collect().head
    assert(out.getAs[Long]("n_words") == 10)
    assert(out.getAs[Long]("n_pieces") == 11)
    assert(math.abs(out.getAs[Double]("fertility") - 1.1) < 1e-12)
  }

  test("bandsFor puts the s-curve inflection at the threshold; candidateProb is the s-curve") {
    val (b, r) = graft.dedup.Dedup.bandsFor(128, threshold = 0.5)
    assert(b * r == 128)
    val inflection = math.pow(1.0 / b, 1.0 / r)
    assert(math.abs(inflection - 0.5) < 0.12, s"inflection $inflection for ($b, $r)")
    // the curve discriminates: well above threshold ≈ certain candidate,
    // well below ≈ never
    assert(graft.dedup.Dedup.candidateProb(0.8, b, r) > 0.97)
    assert(graft.dedup.Dedup.candidateProb(0.2, b, r) < 0.05)
    // monotone in s
    val probs = (1 to 9).map(i => graft.dedup.Dedup.candidateProb(i / 10.0, b, r))
    assert(probs.zip(probs.tail).forall { case (x, y) => x <= y })
    // degenerate corners
    assert(graft.dedup.Dedup.candidateProb(1.0, b, r) == 1.0)
    assert(graft.dedup.Dedup.candidateProb(0.0, b, r) == 0.0)
  }
}
