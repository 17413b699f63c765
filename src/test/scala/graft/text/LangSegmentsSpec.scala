package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LangSegmentsSpec extends SparkSpec {
  import spark.implicits._

  private def segs(text: String): Seq[(Long, String, Long, Long)] =
    LangSegments.segments(Seq((1L, text)).toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .orderBy("seg_no")
      .collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))

  test("code-switched document splits into contiguous language runs") {
    val text = Seq(
      "the cat is in the house and it is fine",
      "it is a good day to be of use",
      "der hund ist nicht zu laut und das ist gut",
      "the end of it all is a thing").mkString("\n")
    assert(segs(text) == Seq(
      (0L, "en", 2L, 0L),
      (1L, "de", 1L, 2L),
      (2L, "en", 1L, 3L)))
  }

  test("monolingual document is one segment; blank lines do not split runs") {
    val text = "the cat is a pet\n\n  \nthe dog is a pet of it"
    assert(segs(text) == Seq((0L, "en", 2L, 0L)))
  }

  test("tie-break is deterministic: zero-hit lines predict the first language") {
    val text = "xyzzy plugh\nder und das ist"
    assert(segs(text) == Seq((0L, "en", 1L, 0L), (1L, "de", 1L, 1L)))
  }
}
