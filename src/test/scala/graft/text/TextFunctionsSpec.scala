package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def eval1[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).head().getAs[T]("r")

  test("normalize trims, lowercases, collapses whitespace") {
    assert(eval1[String](TextFunctions.normalize(col("t")), "  Hello   WORLD \t x ") == "hello world x")
  }

  test("collapseRuns keeps one element per run, on a STAGED array") {
    def collapsed(text: String): Seq[String] =
      Seq(text).toDF("t")
        .select(TextFunctions.tokens(col("t")).as("__ts"))
        .select(TextFunctions.collapseRuns(col("__ts")).as("r"))
        .head().getSeq[String](0)
    assert(collapsed("the the the quick quick fox") == Seq("the", "quick", "fox"))
    // non-adjacent repeats survive — this is stutter removal, not distinct
    assert(collapsed("a a b a") == Seq("a", "b", "a"))
    assert(collapsed("solo") == Seq("solo"))
    assert(collapsed("x") == Seq("x"))
  }

  test("shingles: distinct word 3-grams; short docs yield empty") {
    def shingles(text: String): Seq[String] =
      Seq(text).toDF("t").select(TextFunctions.shingles(col("t"), 3).as("r"))
        .head().getSeq[String](0)
    assert(shingles("a b c d") == Seq("a b c", "b c d"))
    assert(shingles("a b").isEmpty)
  }

  test("tokenCount vs regexTokenCount") {
    assert(eval1[Long](TextFunctions.tokenCount(col("t")), "one two  three") == 3L)
    assert(eval1[Long](TextFunctions.regexTokenCount(col("t")), "ab12,cd") == 4L) // ab|12|,|cd
  }

  test("ratios and quality score stay in [0,1]") {
    val q = eval1[Double](TextFunctions.qualityScore(col("t")), "A clean sentence, with words.")
    assert(q > 0 && q <= 1)
    assert(eval1[Double](TextFunctions.punctRatio(col("t")), "a.b!") == 0.5)
    assert(eval1[Double](TextFunctions.upperRatio(col("t")), "AbCd") == 0.5)
    assert(eval1[Double](TextFunctions.stopwordRatio(col("t"), Seq("the")), "the cat the") == 2.0 / 3)
  }

  test("langId picks the list with most stopword hits; priority order breaks ties") {
    assert(eval1[String](TextFunctions.langId(col("t")), "the cat is of the house and it") == "en")
    assert(eval1[String](TextFunctions.langId(col("t")), "der hund ist ein und das nicht") == "de")
    assert(eval1[String](TextFunctions.langId(col("t")), "el perro que la casa y los") == "es")
    assert(eval1[String](TextFunctions.langId(col("t")), "xyz qqq zzz") == "en") // all-zero tie → priority
  }

  test("fingerprints: whitespace/case variants share md5; near-dups share min shingle") {
    val a = eval1[String](TextFunctions.contentFingerprint(col("t")), "Spark  Engine Rocks")
    val b = eval1[String](TextFunctions.contentFingerprint(col("t")), "spark engine   rocks")
    assert(a == b)
    assert(eval1[String](TextFunctions.minShingleFingerprint(col("t")), "a b") == null)
  }
}
