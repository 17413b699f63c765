package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 full-text retrieval over a document corpus — the query-driven
  * complement to [[TfIdf]] (which scores a document's OWN terms): given
  * a table of queries, return each query's top-k documents by the
  * Okapi BM25 score
  *
  *   Σ_t∈q  ln(1 + (N − df_t + 0.5)/(df_t + 0.5))
  *          · tf_td·(k1+1) / (tf_td + k1·(1 − b + b·dl_d/avgdl))
  *
  * — the standard lexical ranking for corpus search, eval-set retrieval
  * (mining hard negatives), and keyword-based subsetting of a training
  * corpus.
  *
  * Plan shape at 100 TB: document length is computed INSIDE the scan
  * projection (narrow — never a second aggregate over the corpus), the
  * postings list is one (doc, term) hash aggregate with map-side
  * combine, document frequency one (term) hash aggregate over it, and
  * the query set — tiny by construction — broadcasts to both the df
  * join-back and the postings join, so the corpus-sized side never
  * re-shuffles for the queries. Per-query accumulation is a partial
  * aggregate on (query_id, doc_id); only the final top-k window
  * partitions by query — its partition holds each query's MATCHING
  * docs, which a stop-wordy query can blow up to the corpus, so `k`
  * and query hygiene (drop corpus-universal terms upstream, or cap
  * with [[postingsPruned]]-style df filters) are the operator's scale
  * knobs.
  *
  * Query terms are DISTINCT per query (qtf is almost always 1 in web
  * queries; repeating a term in the query does not double-count).
  */
object Bm25 {

  /** (doc_id, term, tf, dl) postings with per-document length riding on
    * every row — `dl` is computed from the token array BEFORE the
    * explode, in its OWN projection: fused with the explode-select, the
    * interpreted `filter` HOF collapses above the Generate and re-runs
    * per exploded row (measured 4× on the corpus pass — the same
    * projection-staging discipline as [[graft.dedup.Dedup]]'s
    * shingleHashes). No separate per-doc aggregate exists either way. */
  def postings(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"), TextFunctions.tokens(text).as("__toks"))
      .select(col("doc_id"),
        size(filter(col("__toks"), t => t =!= "")).cast("long").as("dl"),
        col("__toks"))
      .select(col("doc_id"), col("dl"), explode(col("__toks")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term", "dl").agg(count(lit(1)).as("tf"))

  /** Top-k documents per query. `queries` must expose
    * (query_id, query_text); emits (query_id, doc_id, score, rank)
    * with rank 1..k by (score desc, doc_id asc) — fully deterministic.
    * Documents sharing no term with the query are absent (score 0). */
  def retrieve(
      docs: DataFrame,
      id: Column,
      text: Column,
      queries: DataFrame,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // N = all documents, avgdl over all documents (empty docs count —
    // they can never match, but they are part of the corpus the
    // statistics describe); one row, broadcast everywhere
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      avg(size(filter(TextFunctions.tokens(text), t => t =!= ""))).as("avgdl"))
    val qTerms = queries
      .select(col("query_id"), explode(TextFunctions.tokens(col("query_text"))).as("term"))
      .filter(col("term") =!= "")
      .distinct()
    // Query-term postings are the ONE truncation point: the broadcast
    // semi-probe prunes the corpus-sized postings down to the handful
    // of query terms BEFORE materialization, so the tokenize/explode
    // pass runs exactly once (two consumers below) and the checkpoint
    // holds query-term rows, never the full vocabulary. df is still the
    // CORPUS df: the semi-join keeps every posting of a query term.
    val qPost = graft.operators.Lineage.truncate(
      postings(docs, id, text)
        .join(broadcast(qTerms.select("term").distinct()), Seq("term"), "left_semi"))
    val dfT = qPost.groupBy("term").agg(count(lit(1)).as("df_t"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df_t") + lit(0.5)) / (col("df_t") + lit(0.5)))
    val tfNorm = col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    val scored = qPost
      .join(broadcast(qTerms), Seq("term"))
      .join(broadcast(dfT), Seq("term"))
      .crossJoin(broadcast(stats))
      .groupBy("query_id", "doc_id")
      .agg(sum(idf * tfNorm).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), round(col("score"), 4).as("score"), col("rank"))
  }
}
