package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-bag-of-words linear classifier: fastText-style quality/topic
  * scoring for training-data pipelines (e.g. a "looks like reference
  * text" model gating a crawl corpus).
  *
  * The model is tiny (a dense weight vector over `dim` hashed feature
  * buckets) and ships into the plan as a LITERAL array — inference is a
  * pure narrow map over the token array (hash each token into its
  * bucket, average the bucket weights, sigmoid), zero shuffles, zero
  * joins: exactly what you want bolted onto a 100 TB scan. Feature
  * hashing is md5-derived (not JVM-specific), so any system — including
  * the DuckDB oracle — reproduces the bucket assignment bit-for-bit.
  *
  * [[trainLogistic]] is the matching distributed trainer: full-batch
  * gradient descent where each round is ONE aggregate over the corpus
  * (map-side combined on `dim` keys) and only the `dim`-sized gradient
  * vector ever reaches the driver. For the quality-model sizes this is
  * meant for (dim ≤ a few thousand) that is the production shape; SGD
  * over mini-batches would shuffle MORE per epoch, not less.
  */
object Classifier {

  /** Feature bucket of a token: first 60 bits of md5, mod `dim`.
    * Stable across engines and layouts. */
  def featureIndex(tok: Column, dim: Int): Column =
    pmod(conv(substring(md5(tok), 1, 15), 16, 10).cast("long"), lit(dim))

  /** Mean hashed-bucket weight of a PRE-MATERIALIZED token array
    * (staged by the caller — see TextFunctions.shinglesOf for why), or
    * null for empty docs. */
  private def meanWeight(toks: Column, weights: Seq[Double]): Column = {
    val w = array(weights.map(lit): _*)
    val perTok = transform(toks, t => element_at(w, (featureIndex(t, weights.size) + 1).cast("int")))
    when(size(toks) > 0, aggregate(perTok, lit(0.0), (acc, x) => acc + x) / size(toks))
  }

  /** Sigmoid score in (0,1) per row: `sigmoid(bias + meanWeight)`.
    * Empty documents score `sigmoid(bias)`. */
  def linearScore(toks: Column, weights: Seq[Double], bias: Double): Column = {
    require(weights.nonEmpty, "weights must be non-empty")
    val z = lit(bias) + coalesce(meanWeight(toks, weights), lit(0.0))
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Score every document: (id, score). Tokens are staged in their own
    * projection so the interpreted HOF runs over a materialized array. */
  def scoreDocuments(df: DataFrame, id: Column, text: Column,
                     weights: Seq[Double], bias: Double): DataFrame =
    df.select(id.as("doc_id"), TextFunctions.tokens(text).as("__t"))
      .select(col("doc_id"), linearScore(col("__t"), weights, bias).as("score"))

  /** Full-batch logistic-regression training over hashed features.
    * `label` must be 0.0/1.0. Returns (weights, bias) after `rounds`
    * gradient steps at learning rate `lr`, starting from zeros.
    *
    * Per round: residuals are a narrow map (score under the CURRENT
    * literal weights), the weight gradient is one (feature-bucket)
    * aggregate — at most `dim` rows cross the shuffle after map-side
    * combine — and the bias gradient rides in the same pass via a
    * grouping-sets-free trick (bucket -1). Only `dim + 1` doubles are
    * collected per round; documents never leave the executors. */
  def trainLogistic(df: DataFrame, text: Column, label: Column, dim: Int,
                    rounds: Int, lr: Double): (Seq[Double], Double) = {
    require(dim > 0 && rounds >= 0 && lr > 0, s"bad params: dim=$dim rounds=$rounds lr=$lr")
    var weights: Seq[Double] = Seq.fill(dim)(0.0)
    var bias = 0.0
    // Each round re-reads this plan (tokenize + score + aggregate);
    // callers doing many rounds over a large corpus should persist the
    // tokenized projection first — the library does not cache behind
    // the caller's back.
    val staged = df.select(TextFunctions.tokens(text).as("__t"), label.cast("double").as("__y"))
    val n = staged.count().toDouble
    for (_ <- 0 until rounds) {
      // residual r = p - y; d/dw_j = avg_docs r * cnt_j/n ; d/db = avg r
      val resid = staged.select(col("__t"), col("__y"),
        (linearScore(col("__t"), weights, bias) - col("__y")).as("__r"))
      // one exploded pass: each token contributes (bucket, r/n); a
      // sentinel bucket -1 contributes (−1, r) once per doc for the bias
      val contrib = resid.select(
        explode(concat(
          transform(col("__t"), t =>
            struct(featureIndex(t, dim).as("j"), (col("__r") / size(col("__t"))).as("g"))),
          array(struct(lit(-1L).as("j"), col("__r").as("g"))))).as("c"))
        .groupBy(col("c.j").as("j")).agg(sum(col("c.g")).as("g"))
        .collect()
      val byBucket = contrib.map(r => r.getLong(0) -> r.getDouble(1)).toMap
      weights = weights.zipWithIndex.map { case (w, j) =>
        w - lr * byBucket.getOrElse(j.toLong, 0.0) / n
      }
      bias = bias - lr * byBucket.getOrElse(-1L, 0.0) / n
    }
    (weights, bias)
  }
}
