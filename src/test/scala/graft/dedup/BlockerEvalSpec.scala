package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BlockerEvalSpec extends SparkSpec {
  import spark.implicits._

  // docs 1-2 and 3-4 are near-dup pairs; 5 is unrelated
  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again today"),
    (2L, "the quick brown fox jumps over the lazy dog again tonight"),
    (3L, "pack my box with five dozen liquor jugs before noon strikes"),
    (4L, "pack my box with five dozen liquor jugs before noon arrives"),
    (5L, "completely unrelated text having nothing shared with any other"))
    .toDF("doc_id", "text")

  test("recall and precision against the exact truth; orientation normalized") {
    // blocker surfaces (2,1) reversed + (3,4) + a junk pair (1,5), twice
    val cand = Seq((2L, 1L), (3L, 4L), (1L, 5L), (5L, 1L)).toDF("doc_a", "doc_b")
    val r = BlockerEval.report(docs, col("doc_id"), col("text"), cand, threshold = 0.5)
      .head()
    assert(r.getAs[Long]("n_true") === 2L)
    assert(r.getAs[Long]("n_candidates") === 3L) // (1,5) dedupes
    assert(r.getAs[Long]("n_found") === 2L)
    assert(r.getAs[Double]("recall") === 1.0)
    assert(math.abs(r.getAs[Double]("precision") - 0.6667) < 1e-9)
  }

  test("dogfood: MinHash banding and sorted-neighborhood both measured against one truth") {
    // the harness is blocker-agnostic: D2's probabilistic bander and
    // D66's deterministic window both plug in unchanged
    val mh = Dedup.minHashCandidates(docs, col("doc_id"), col("text"))
      .select("doc_a", "doc_b")
    val rmh = BlockerEval.report(docs, col("doc_id"), col("text"), mh, threshold = 0.5).head()
    assert(rmh.getAs[Long]("n_true") === 2L)
    assert(rmh.getAs[Double]("recall") === 1.0,
      s"J=0.8+ twins must survive banding: $rmh")
    val sn = SortedNeighborhood.neighborPairs(docs, col("doc_id"),
      Seq(length(col("text"))), window = 1)
    val rsn = BlockerEval.report(docs, col("doc_id"), col("text"), sn, threshold = 0.5).head()
    assert(rsn.getAs[Double]("recall") === 1.0,
      s"length-adjacent twins must survive the window: $rsn")
  }

  test("a blind blocker scores zero recall; empty truth yields null recall") {
    val none = Seq((1L, 5L)).toDF("doc_a", "doc_b")
    val r = BlockerEval.report(docs, col("doc_id"), col("text"), none, threshold = 0.5).head()
    assert(r.getAs[Long]("n_found") === 0L && r.getAs[Double]("recall") === 0.0)
    val strict = BlockerEval.report(docs, col("doc_id"), col("text"), none, threshold = 0.999)
      .head()
    assert(strict.getAs[Long]("n_true") === 0L)
    assert(strict.isNullAt(strict.fieldIndex("recall")))
  }
}
