package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term scoring over a document corpus — the classic signal for
  * keyword extraction, boilerplate detection, and quality filtering in
  * training-data pipelines.
  *
  * Plan shape at 100 TB: one explode of the staged token array → a
  * (doc, term) hash aggregate for term frequencies (map-side combine) →
  * a (term) hash aggregate for document frequencies → an equi-join of
  * the two keyed on the term (shuffle moves (term, df) pairs, never
  * documents) → a per-doc window for top-k. No driver-side vocabulary,
  * no collect — the vocabulary lives in the shuffle.
  */
object TfIdf {

  /** Smoothed IDF: ln((N+1)/(df+1)) + 1 — never zero or negative, so
    * corpus-wide terms still rank below rare ones but are not erased. */
  def idf(nDocs: Column, df: Column): Column =
    log((nDocs.cast("double") + 1.0) / (df.cast("double") + 1.0)) + 1.0

  /** (doc_id, term, tf) term frequencies over whitespace tokens of
    * normalized text. */
  def termFrequencies(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"), TextFunctions.tokens(text).as("__toks"))
      .select(col("doc_id"), explode(col("__toks")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** Top-k terms per document by tf·idf. Deterministic: ties break on
    * the term string. Output: (doc_id, term, tf, score). */
  def topTerms(docs: DataFrame, id: Column, text: Column, k: Int): DataFrame = {
    val tf = termFrequencies(docs, id, text)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
    // N = DISTINCT documents with ≥1 non-empty token — counted with an
    // explode-FREE scan of the source instead of countDistinct over tf,
    // which gave the token explosion a third lineage parent that AQE's
    // stage reuse did not cover (measured: 3 executed explosions; the
    // doc-frequency side stays a groupBy+join because its partial
    // aggregation is what absorbs Zipf-skewed terms). Distinct on the
    // id, not a row count: termFrequencies merges duplicate doc_id rows
    // into one document, and N must agree or every idf silently shifts.
    val n = docs.agg(
      countDistinct(when(exists(TextFunctions.tokens(text), t => t =!= ""), id))
        .as("n_docs"))
    val scored = tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf") * idf(col("n_docs"), col("df_t")))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term").asc)
    scored.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), round(col("score"), 4).as("score"))
  }
}
