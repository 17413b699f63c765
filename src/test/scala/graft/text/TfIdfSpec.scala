package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark spark shuffle"),
    (2L, "spark join"),
    (3L, "window join")).toDF("doc_id", "text")

  test("termFrequencies counts per (doc, term)") {
    val tf = TfIdf.termFrequencies(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(tf((1L, "spark")) == 2L)
    assert(tf((2L, "join")) == 1L)
  }

  test("topTerms ranks rare terms above corpus-wide ones") {
    // doc1: 'shuffle' (df=1) must outscore single 'spark' (df=2)… but tf=2
    // for spark — check the actual idf math instead of guessing:
    // spark: 2·(ln(4/3)+1) ≈ 2.575;  shuffle: 1·(ln(4/2)+1) ≈ 1.693
    val top = TfIdf.topTerms(docs, col("doc_id"), col("text"), k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top(1L) == "spark")   // high tf wins in doc 1
    assert(top(3L) == "window")  // df=1 beats join's df=2 at equal tf
  }

  test("topTerms is deterministic on score ties (term order)") {
    val tied = Seq((1L, "b a")).toDF("doc_id", "text") // both tf=1, df=1
    val top = TfIdf.topTerms(tied, col("doc_id"), col("text"), k = 1).head()
    assert(top.getString(1) == "a")
  }

  test("duplicate doc_id rows do not inflate N (idf stays stable)") {
    // doc 1 appears as TWO source rows; termFrequencies merges them into
    // one document, so N must be 3 (distinct ids), not 4 (rows) — a row
    // count silently shifts every idf score
    val dup = Seq(
      (1L, "spark spark shuffle"),
      (1L, "spark extra"),
      (2L, "spark join"),
      (3L, "window join")).toDF("doc_id", "text")
    val scored = TfIdf.topTerms(dup, col("doc_id"), col("text"), k = 10)
      .filter(col("doc_id") === 3L && col("term") === "window").head()
    // window: tf=1, df=1, N=3 → 1·(ln(4/2)+1) ≈ 1.6931
    assert(math.abs(scored.getDouble(3) - 1.6931) < 0.0005,
      s"score ${scored.getDouble(3)} implies N != distinct-doc count")
  }
}
