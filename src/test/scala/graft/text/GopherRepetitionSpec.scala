package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class GopherRepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def repOf(text: String): Map[String, Any] = {
    val row: Row = GopherRepetition.addFlags(Seq(text).toDF("text"), col("text"))
      .select("rep.*").head()
    row.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> row.get(i) }.toMap
  }

  private def d(v: Any): Double = v.asInstanceOf[Double]

  test("top 2-gram char fraction: hand-computed with count-tie to equal chars") {
    // tokens [the cat the cat the dog]: "the cat"×2 and "cat the"×2 (7 chars
    // each → 14 covered), "the dog"×1; norm length 23
    val f = repOf("the cat the cat the dog")
    assert(math.abs(d(f("top_2gram_char_frac")) - 14.0 / 23.0) < 1e-12)
    assert(f("ok_top_ngrams") == false)
  }

  test("duplicated 5-gram char fraction counts every occurrence") {
    // "a b c d e" appears at positions 1 and 6 → 2 × 9 chars over norm 19
    val f = repOf("a b c d e a b c d e")
    assert(math.abs(d(f("dup_5gram_char_frac")) - 18.0 / 19.0) < 1e-12)
    assert(f("ok_dup_ngrams") == false)
  }

  test("duplicate-line rules: fraction vs character fraction diverge") {
    // 4 lines, 1 duplicate → frac 0.25 ≤ 0.30 passes; chars 11/44 = 0.25
    // > 0.20 fails — the char rule catches long repeated lines
    val f = repOf("hello world\nhello world\nunique line\nanother one")
    assert(math.abs(d(f("dup_line_frac")) - 0.25) < 1e-12)
    assert(f("ok_dup_lines") == true)
    assert(math.abs(d(f("dup_line_char_frac")) - 0.25) < 1e-12)
    assert(f("ok_dup_line_chars") == false)
  }

  test("duplicate-paragraph fraction over blank-line-separated paragraphs") {
    val f = repOf("para one text\n\npara one text\n\ndifferent paragraph")
    assert(math.abs(d(f("dup_para_frac")) - 1.0 / 3.0) < 1e-12)
    assert(f("ok_dup_paras") == false)
  }

  test("varied prose keeps; degenerate stutter fails everything n-gram") {
    val clean = (1 to 60).map(i => s"word$i").mkString(" ")
    assert(repOf(clean)("keep") == true)
    val spam = Seq.fill(30)("spam").mkString(" ")
    val f = repOf(spam)
    assert(f("ok_top_ngrams") == false)
    assert(f("ok_dup_ngrams") == false)
  }

  test("empty and whitespace-only text yield zero fractions and keep") {
    for (t <- Seq("", "   ", "\n\n")) {
      val f = repOf(t)
      assert(d(f("dup_line_frac")) == 0.0)
      assert(d(f("top_2gram_char_frac")) == 0.0)
      assert(d(f("dup_10gram_char_frac")) == 0.0)
      assert(f("keep") == true, s"text=${t.replace("\n", "\\n")}")
    }
  }

  test("native gram stats match a brute-force recomputation on seeded docs") {
    val rng = new scala.util.Random(42)
    val vocab = Vector("a", "bb", "ccc", "dddd", "unrelated", "x1", "y22", "zz")
    for (_ <- 1 to 20) {
      val toks = Vector.fill(3 + rng.nextInt(60))(vocab(rng.nextInt(vocab.size)))
      val text = toks.mkString(" ")
      val f = repOf(text)
      val nchars = math.max(text.length, 1)
      for ((n, field) <- Seq(2 -> "top_2gram_char_frac", 3 -> "top_3gram_char_frac")) {
        val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
        val counts = grams.groupBy(identity).view.mapValues(_.size)
        val expected =
          if (grams.isEmpty) 0.0
          else {
            val mx = counts.values.max
            counts.collect { case (g, c) if c == mx => c.toLong * g.length }.max.toDouble / nchars
          }
        assert(math.abs(d(f(field)) - expected) < 1e-12, s"n=$n text=$text")
      }
      val dup5 = {
        val grams = toks.sliding(5).map(_.mkString(" ")).toSeq
        if (toks.size < 5) 0.0
        else grams.groupBy(identity).values.collect {
          case g if g.size >= 2 => g.size.toLong * g.head.length
        }.sum.toDouble / nchars
      }
      assert(math.abs(d(f("dup_5gram_char_frac")) - dup5) < 1e-12, s"text=$text")
    }
  }

  test("single repeated long line dominates both line metrics") {
    val f = repOf(Seq.fill(10)("this exact line repeats verbatim").mkString("\n"))
    assert(math.abs(d(f("dup_line_frac")) - 0.9) < 1e-12)
    assert(math.abs(d(f("dup_line_char_frac")) - 0.9) < 1e-12)
    assert(f("keep") == false)
  }
}
