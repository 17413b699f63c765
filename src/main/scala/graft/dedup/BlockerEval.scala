package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocker-quality evaluation: how much of the TRUE near-duplicate
  * pair set does a candidate generator (D2 MinHash banding, D66
  * sorted-neighborhood, C20 gram index, or any user blocker) actually
  * surface, and at what candidate volume? Dedup pipelines silently
  * trade recall for cost in their blockers; this harness measures the
  * trade instead of guessing it — run it on a sampled slice, pick
  * banding/window/df parameters from MEASURED recall, then deploy the
  * blocker at full scale (ground truth on the full corpus would cost
  * the all-pairs work the blocker exists to avoid; recall estimated on
  * a uniform document sample is unbiased for pair recall within the
  * sample).
  */
object BlockerEval {

  /** One-row report scoring `candidates` (doc_a, doc_b) against the
    * exact-Jaccard truth at `threshold`: true/candidate/found pair
    * counts, recall (found/true), precision (found/candidates).
    * Pair orientation is normalized (a < b) and duplicates collapse,
    * so blockers may emit either orientation. `maxDf` caps the truth
    * computation's inverted index exactly as [[Dedup.jaccardPairs]]. */
  def report(df: DataFrame, id: Column, text: Column, candidates: DataFrame,
      threshold: Double, k: Int = 3, maxDf: Int = 1000): DataFrame = {
    val truth = Dedup.jaccardPairs(df, id, text, threshold, k, maxDf)
      .select(col("doc_a"), col("doc_b"))
    val cand = candidates.select(
        least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"))
      .distinct()
    val found = cand.join(truth, Seq("doc_a", "doc_b"), "left_semi")
    val counts = truth.agg(count(lit(1)).as("n_true"))
      .crossJoin(cand.agg(count(lit(1)).as("n_candidates")))
      .crossJoin(found.agg(count(lit(1)).as("n_found")))
    counts.select(col("n_true"), col("n_candidates"), col("n_found"),
      round(when(col("n_true") > 0, col("n_found") / col("n_true")), 4).as("recall"),
      round(when(col("n_candidates") > 0, col("n_found") / col("n_candidates")), 4)
        .as("precision"))
  }
}
