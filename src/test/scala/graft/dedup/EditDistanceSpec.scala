package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EditDistanceSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("spellVariantPairs equals brute-force levenshtein<=1 over the vocabulary") {
    val words = Seq("cats", "cat", "bat", "hat", "hats", "zzzz", "receive",
      "recieve", "cart", "card", "care")
    val vocab = words.toDF("term")
    val got = EditDistance.spellVariantPairs(vocab, col("term"), minLen = 3)
      .orderBy("a", "b").as[(String, String, Int)].collect().toSeq
    val kept = words.filter(_.length >= 3).distinct
    val want = (for {
      a <- kept; b <- kept if a < b
      d = lev(a, b) if d <= 1
    } yield (a, b, d)).sortBy(p => (p._1, p._2))
    assert(got === want)
  }

  test("false candidates from shared deletion keys are killed by the exact verify") {
    // "abcd"/"bacd" share deletion keys "acd" and "bcd" but sit at distance 2
    val vocab = Seq("abcd", "bacd").toDF("term")
    val got = EditDistance.spellVariantPairs(vocab, col("term")).count()
    assert(got === 0L)
  }

  test("keyDfCap drops a pathological neighborhood whole; duplicates and short terms excluded") {
    // aaab/aaac/aaad pairwise share ONLY the key "aaa" (df 3)
    val vocab = Seq("aaab", "aaab", "aaac", "aaad", "ab").toDF("term")
    assert(EditDistance.spellVariantPairs(vocab, col("term"), keyDfCap = 2).count() === 0L)
    val full = EditDistance.spellVariantPairs(vocab, col("term"), keyDfCap = 100)
      .as[(String, String, Int)].collect().toSet
    assert(full === Set(("aaab", "aaac", 1), ("aaab", "aaad", 1), ("aaac", "aaad", 1)))
  }
}
