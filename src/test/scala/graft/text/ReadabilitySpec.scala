package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ReadabilitySpec extends SparkSpec {
  import spark.implicits._

  private def m(text: String): Map[String, Any] = {
    val row = Seq(text).toDF("text")
      .select(Readability.metrics(col("text")).as("m")).select("m.*").head()
    row.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> row.get(i) }.toMap
  }

  test("hand-computed Flesch metrics on a two-sentence text") {
    // "the cat sat. the dog ran." → 2 sentences, 6 words,
    // syllables: the(1) cat(1) sat(1) the(1) dog(1) ran(1) = 6
    val f = m("the cat sat. the dog ran.")
    assert(f("n_sentences") == 2L && f("n_words") == 6L && f("n_syllables") == 6L)
    val ease = 206.835 - 1.015 * 3.0 - 84.6 * 1.0
    assert(math.abs(f("reading_ease").asInstanceOf[Double] - ease) < 1e-9)
    val grade = 0.39 * 3.0 + 11.8 * 1.0 - 15.59
    assert(math.abs(f("fk_grade").asInstanceOf[Double]
      - BigDecimal(grade).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("vowel groups count syllables; vowel-free words floor at 1") {
    val f = m("rhythm xyz extraordinary.")
    // rhythm: y → 1; xyz: y → 1; extraordinary: e-ao-i-a-y → eligible
    // groups e,ao,i,a,y = 5 (xtr splits) — total 7
    assert(f("n_syllables") == 7L, s"got ${f("n_syllables")}")
    val g = m("brrr grr.")
    assert(g("n_syllables") == 2L) // both floored at 1
  }

  test("long rambling sentences raise the grade; short ones lower it") {
    val simple = m("the cat sat. the dog ran. a bird flew.")
    val complex = m(("extraordinarily complicated administrative considerations " +
      "necessitate comprehensive organizational restructuring " +
      "methodologies throughout interminable bureaucratic deliberations") + ".")
    assert(complex("fk_grade").asInstanceOf[Double] > simple("fk_grade").asInstanceOf[Double] + 5)
  }

  test("degenerate inputs: empty and punctuation-only score zero") {
    for (t <- Seq("", "...", "   ")) {
      val f = m(t)
      assert(f("n_words") == 0L && f("reading_ease") == 0.0 && f("fk_grade") == 0.0, s"text=$t")
    }
  }
}
