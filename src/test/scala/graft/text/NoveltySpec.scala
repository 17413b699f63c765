package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NoveltySpec extends SparkSpec {
  import spark.implicits._

  // ref knows "a b c d"; gen doc 1 copies it verbatim, doc 2 is half
  // novel, doc 3 fully novel, doc 4 too short for a trigram
  private val ref = Seq((100L, "a b c d"), (101L, "x y z w")).toDF("id", "text")
  private val gen = Seq(
    (1L, "a b c d"),          // grams: abc, bcd — both seen
    (2L, "a b c q r"),        // abc seen; bcq, cqr novel
    (3L, "p q r s"),          // pqr, qrs novel
    (4L, "a b"))              // no trigram → absent from output
    .toDF("id", "text")

  test("exact novelty counts distinct grams against the reference") {
    val got = Novelty.ngramNovelty(gen, ref, col("id"), col("text"), n = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_grams", "n_seen", "novelty")
      .as[(Long, Long, Long, Double)].collect().toList
    assert(got == List(
      (1L, 2L, 2L, 0.0),
      (2L, 3L, 1L, 1.0 - 1.0 / 3.0),
      (3L, 2L, 0L, 1.0)))
  }

  test("repeated grams within a doc count once (distinct semantics)") {
    val g = Seq((1L, "a b c a b c")).toDF("id", "text")
    // distinct grams: "a b c","b c a","c a b" — only "a b c" is in ref
    val r = Novelty.ngramNovelty(g, ref, col("id"), col("text"), n = 3)
      .select("n_grams", "n_seen").as[(Long, Long)].head()
    assert(r == ((3L, 1L)))
  }

  test("bloom path lower-bounds novelty and matches exact at tiny fpp") {
    val exact = Novelty.ngramNovelty(gen, ref, col("id"), col("text"), n = 3)
      .select("doc_id", "n_seen").as[(Long, Long)].collect().toMap
    val bloom = Novelty.ngramNoveltyBloom(gen, ref, col("id"), col("text"), n = 3,
        expectedGrams = 100L, fpp = 0.0001)
      .select("doc_id", "n_seen").as[(Long, Long)].collect().toMap
    assert(bloom.keySet == exact.keySet)
    // n_seen can only be inflated by false positives, never deflated
    assert(exact.forall { case (d, s) => bloom(d) >= s })
    // at fpp 1e-4 over a handful of grams, counts coincide
    assert(bloom == exact)
  }
}
