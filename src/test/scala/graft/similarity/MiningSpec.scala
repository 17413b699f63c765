package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MiningSpec extends SparkSpec {
  import spark.implicits._

  // cos matrix: (a1,b1)=1  (a1,b2)=0.6  (a2,b1)=0  (a2,b2)=0.8
  // k=2 backgrounds: a1→0.8  a2→0.4  b1→0.5  b2→0.7
  // margins: (a1,b1)=1/0.65  (a1,b2)=0.8  (a2,b1)=0  (a2,b2)=0.8/0.55
  private val vecs = Seq(
    (1L, "A", Array(1.0f, 0.0f)), (2L, "A", Array(0.0f, 1.0f)),
    (11L, "B", Array(1.0f, 0.0f)), (12L, "B", Array(0.6f, 0.8f)))
    .toDF("id", "grp", "v")

  test("margins match the hand computation; the density rescale picks both aligned pairs") {
    val got = Mining.marginPairs(vecs, "id", "v", "grp", "A", "B", k = 2, minMargin = 1.2)
      .select("a_id", "b_id", "margin").as[(Long, Long, Double)].collect()
      .map { case (a, b, m) => (a, b, math.rint(m * 1e6) / 1e6) }.toSet
    assert(got == Set((1L, 11L, math.rint(1e6 / 0.65) / 1e6),
      (2L, 12L, math.rint(0.8 / 0.55 * 1e6) / 1e6)))
    // raw-cosine thresholding at the same selectivity CANNOT make that
    // choice: cos(a1,b2)=0.6 ranks above cos... — (a2,b2)=0.8 outranks
    // nothing here, but (a1,b2)=0.6 < 0.8 means a global cos cut keeping
    // 2 pairs keeps (a1,b1) and (a2,b2) only by luck of this data;
    // margin keeps them by construction (both > 1.2, others ≤ 0.8)
    val margins = Mining.marginPairs(vecs, "id", "v", "grp", "A", "B", k = 2, minMargin = 0.0)
      .select("margin").as[Double].collect().sorted
    assert(margins.length == 4 && margins(1) <= 0.8 + 1e-6) // float32 inputs → ~1e-8 slack
  }

  test("non-positive backgrounds yield no pairs instead of sign-flipped margins") {
    val anti = Seq(
      (1L, "A", Array(1.0f, 0.0f)), (11L, "B", Array(-1.0f, 0.0f)))
      .toDF("id", "grp", "v")
    val got = Mining.marginPairs(anti, "id", "v", "grp", "A", "B", k = 2, minMargin = -10.0)
    assert(got.isEmpty, "a negative-background pair must be dropped, not emitted with flipped sign")
    intercept[IllegalArgumentException] {
      Mining.marginPairs(vecs, "id", "v", "grp", "A", "B", k = 0, minMargin = 1.0)
    }
  }
}
