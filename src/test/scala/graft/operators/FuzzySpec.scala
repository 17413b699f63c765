package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  test("charGrams: distinct n-grams, short-string fallback, empty-safe") {
    def grams(s: String, n: Int): Seq[String] =
      spark.range(1).select(Fuzzy.charGrams(lit(s), n).as("g")).as[Seq[String]].head()
    assert(grams("abab", 3) == Seq("aba", "bab"))
    assert(grams("Ab  a", 2) == Seq("ab", "b ", " a")) // normalized first
    assert(grams("ab", 3) == Seq("ab"))                // whole short string
    assert(grams("  ", 3).isEmpty)
  }

  test("fuzzyJoinPairs links typo'd twins, exact jaccard, no cross-noise") {
    val left = Seq((1L, "Acme Corporation"), (2L, "Globex Industries"), (3L, "Initech LLC"))
      .toDF("id", "name")
    val right = Seq((11L, "Acme Corpration"),   // missing 'o'
      (12L, "Globex Indastries"),               // 'u'→'a'
      (13L, "Wholly Unrelated Co"))
      .toDF("id", "name")
    val pairs = Fuzzy.fuzzyJoinPairs(left, col("id"), col("name"),
        right, col("id"), col("name"), threshold = 0.4)
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 11L), (2L, 12L)))
    // exact jaccard value for a hand-computed pair
    val j = Fuzzy.fuzzyJoinPairs(
        Seq((1L, "abcd")).toDF("id", "name"), col("id"), col("name"),
        Seq((2L, "abcde")).toDF("id", "name"), col("id"), col("name"),
        threshold = 0.1)
      .select("jaccard").as[Double].head()
    // grams: {abc,bcd} vs {abc,bcd,cde} → 2/3
    assert(j == 0.6667)
  }

  test("stop-gram cap drops universal grams; scores reflect the capped universe") {
    // 12 rows all share the prefix "id-00"; distinguishing suffix digits differ
    val left = (0L until 12L).map(i => (i, f"id-00$i%02d")).toDF("id", "name")
    val right = (0L until 12L).map(i => (i + 100L, f"id-00$i%02d")).toDF("id", "name")
    val capped = Fuzzy.fuzzyJoinPairs(left, col("id"), col("name"),
      right, col("id"), col("name"), threshold = 0.9, maxDf = 10)
    // with the universal "id-","d-0","-00","000" grams capped out, only
    // the true twin shares every surviving gram; row 0 ("id-0000") is
    // made ENTIRELY of universal grams, so it carries no evidence and
    // matches nothing — the documented stop-gram trade-off
    val m = capped.select("left_id", "right_id").as[(Long, Long)].collect().toSet
    assert(m == (1L until 12L).map(i => (i, i + 100L)).toSet)
  }

  test("bestMatch keeps one highest-jaccard row per left id") {
    val left = Seq((1L, "alpha beta")).toDF("id", "name")
    val right = Seq((10L, "alpha beta"), (11L, "alpha betta"), (12L, "gamma")).toDF("id", "name")
    val best = Fuzzy.bestMatch(left, col("id"), col("name"),
        right, col("id"), col("name"), threshold = 0.2)
      .select("left_id", "right_id").as[(Long, Long)].collect().toSeq
    assert(best == Seq((1L, 10L))) // the exact copy wins over the typo
  }
}
