package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PretrainPipelineSpec extends SparkSpec {
  import spark.implicits._

  // two 60-word blocks that pass every Gopher gate (stop words via
  // "the"/"and", all 2-grams unique so no repetition rule trips)
  private val blockA = (1 to 15).map(i => s"the word$i and word${i}b").mkString(" ")
  private val blockB = (1 to 15).map(i => s"the other$i and other${i}b").mkString(" ")

  private val docs = Seq(
    (1L, blockA, "s"),                      // gated, exact winner, 1 para
    (2L, blockA, "s"),                      // exact duplicate of 1 → dropped
    (3L, "too short", "s"),                 // fails the word-count gate
    (4L, blockB + "\n\n" + blockA, "s"))    // gated; 2nd para owned by doc 1
    .toDF("doc_id", "text", "source")

  test("summary counts the full funnel") {
    val row = PretrainPipeline.summary(docs, col("doc_id"), col("text"), col("source")).head()
    assert(row.getAs[String]("source") == "s")
    assert(row.getAs[Long]("n_docs") == 4L)
    assert(row.getAs[Long]("n_gated") == 3L)
    assert(row.getAs[Long]("n_exact_kept") == 2L)
    assert(row.getAs[Long]("n_paras") == 3L)        // doc1: 1, doc4: 2
    assert(row.getAs[Long]("n_kept_paras") == 2L)   // doc4's blockA copy dropped
    assert(row.getAs[Long]("n_tokens_clean") == 120L) // 60 (doc1) + 60 (doc4 blockB)
  }

  test("clean emits exact survivors with paragraph-deduplicated text") {
    val out = PretrainPipeline.clean(docs, col("doc_id"), col("text"), col("source"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out.keySet == Set(1L, 4L))
    assert(out(1L) == blockA)
    assert(out(4L) == blockB)
  }

  test("cross-document paragraph ownership strips the shared block") {
    val shared = Seq((1L, blockA, "s"), (6L, "intro\n\n" + blockA, "s"))
      .toDF("doc_id", "text", "source")
    val out = PretrainPipeline.clean(shared, col("doc_id"), col("text"), col("source"))
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3), r.getLong(4)))).toMap
    // doc 6 passes the gates and exact dedup (distinct text) but its
    // blockA paragraph is owned by doc 1 — only "intro" survives
    assert(out(6L)._1 == "intro")
    assert(out(6L)._2 == 2L && out(6L)._3 == 1L)
  }
}
