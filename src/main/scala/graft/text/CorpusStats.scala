package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-composition statistics for dataset mixing: how far each
  * source's token distribution sits from the corpus-wide distribution.
  * Mixing decisions (up/down-weighting a source in the training blend)
  * need exactly this signal, next to the per-document scores in
  * [[TextFunctions]].
  *
  * Plan shape at 100 TB: one explode → (source, token) hash aggregate
  * (map-side combine — the shuffle carries one row per distinct
  * (source, token), not per occurrence), a token-keyed join to attach
  * global counts (both sides already aggregated), and a final per-source
  * aggregate. No driver-side vocabulary, no collects — the same shuffle
  * discipline as [[TfIdf]].
  */
object CorpusStats {

  /** Per-source token-distribution report:
    * (source, n_tokens, n_distinct, kl_bits).
    *
    * `kl_bits` is the Kullback–Leibler divergence KL(source ‖ corpus) in
    * bits: Σ_t p_s(t) · log2(p_s(t) / q(t)) over the source's tokens,
    * where p_s is the source's empirical unigram distribution and q the
    * whole corpus's. 0 = indistinguishable from the blend; larger =
    * more idiosyncratic. Always finite: every token of a source is by
    * construction part of the corpus distribution (q(t) > 0). */
  def sourceDivergence(df: DataFrame, source: Column, text: Column): DataFrame = {
    val tok = df.select(source.as("source"), explode(TextFunctions.tokens(text)).as("t"))
    val bySource = tok.groupBy("source", "t").agg(count(lit(1)).as("c_st"))
    val totals = bySource.groupBy("source").agg(sum("c_st").as("n_s"))
    val global = bySource.groupBy("t").agg(sum("c_st").as("c_t"))
    // corpus total rides as a single-row broadcast (the d16/TfIdf
    // pattern) — no plan-time driver action, no extra job
    val grandTotal = bySource.agg(sum("c_st").as("n_total"))
    bySource
      .join(global, "t")
      .join(totals, "source")
      .crossJoin(broadcast(grandTotal))
      .withColumn("__p", col("c_st").cast("double") / col("n_s"))
      .withColumn("__q", col("c_t").cast("double") / col("n_total"))
      .groupBy("source")
      .agg(max("n_s").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        round(sum(col("__p") * log2(col("__p") / col("__q"))), 4).as("kl_bits"))
  }

  /** Per-document cross-entropy under the corpus unigram LM, in bits
    * per token: H(d) = −Σ_t (c_dt/n_d)·log2(q(t)) with q the corpus
    * unigram distribution. The relational analog of CCNet's LM-
    * perplexity filter: low = built from the corpus's most common
    * tokens (boilerplate), high = rare-token-heavy (gibberish, wrong
    * language, binary junk) — both tails are what quality filters cut.
    * Always finite (every doc token is in the corpus distribution).
    *
    * Plan shape: (doc, token) hash aggregate → token-keyed join to the
    * (already aggregated) global counts → per-doc aggregate; the corpus
    * total is a single-row broadcast. n_d rides inside the final
    * aggregate as Σc_dt, so one pass computes both count and entropy. */
  def docCrossEntropy(df: DataFrame, id: Column, text: Column): DataFrame = {
    val tok = df.select(id.as("doc_id"), explode(TextFunctions.tokens(text)).as("t"))
    val byDoc = tok.groupBy("doc_id", "t").agg(count(lit(1)).as("c_dt"))
    val global = byDoc.groupBy("t").agg(sum("c_dt").as("c_t"))
    val grandTotal = global.agg(sum("c_t").as("n_total"))
    byDoc.join(global, "t")
      .crossJoin(broadcast(grandTotal))
      .groupBy("doc_id")
      .agg(sum("c_dt").as("n_tokens"),
        round(-sum(col("c_dt") * log2(col("c_t").cast("double") / col("n_total")))
          / sum("c_dt"), 4).as("xent_bits"))
  }
}
