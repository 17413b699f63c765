package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
  * arXiv 2302.03169): pick raw-corpus documents that look like a TARGET
  * domain by importance weight under hashed n-gram bag-of-words models,
  * the published cheap alternative to classifier-based selection
  * ([[Classifier]] is the sibling; DSIR needs no labels or training —
  * just the two corpora).
  *
  * Pipeline shape, built for the 100 TB scan:
  *   1. features = hashed unigram + bigram buckets
  *      ([[Classifier.featureIndex]]'s md5-derived hashing, so every
  *      engine reproduces the buckets bit-for-bit);
  *   2. the two bucket distributions are each ONE exploded
  *      partial-aggregating `groupBy(bucket)` — at most `dim` rows
  *      cross the shuffle after map-side combine, and only `dim`
  *      (count) pairs reach the driver (the [[Classifier.trainLogistic]]
  *      bounded-collect discipline);
  *   3. log-importance weights λ_j = log p_target(j) − log p_raw(j)
  *      (add-1 smoothed) ship back into the plan as a LITERAL array, so
  *      scoring is a zero-shuffle narrow map: one in-row fold over the
  *      document's feature buckets;
  *   4. selection is deterministic Gumbel top-k — importance sampling
  *      without replacement as one `TakeOrdered(k)`, no global sort, no
  *      RNG: the Gumbel noise derives from the md5 hash of the id
  *      ([[graft.operators.Sampling.hashBucket]]), reproducible across
  *      engines, retries, and cluster layouts.
  */
object Dsir {

  /** Hashed unigram + bigram feature buckets of a PRE-MATERIALIZED
    * token array (staged by the caller — the HOF-CSE rule,
    * [[TextFunctions.shinglesOf]]). Bigrams pair each token with its
    * successor in the array domain (both sides sliced to length n−1, so
    * `zip_with` never pads; the d37 shift idiom). */
  def featureBuckets(toks: Column, dim: Int): Column = {
    val n1 = greatest(size(toks) - 1, lit(0))
    val bi = zip_with(slice(toks, lit(1), n1), slice(toks, lit(2), n1),
      (a, b) => Classifier.featureIndex(concat_ws(" ", a, b), dim))
    concat(transform(toks, t => Classifier.featureIndex(t, dim)), bi)
  }

  /** (bucket, cnt) distribution of a corpus — one exploded
    * map-side-combined aggregate, ≤ `dim` result rows. */
  def bucketCounts(df: DataFrame, text: Column, dim: Int): DataFrame =
    df.select(TextFunctions.tokens(text).as("__t"))
      .select(featureBuckets(col("__t"), dim).as("__f"))
      .select(explode(col("__f")).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Add-1-smoothed log-importance weights λ_j = log p_target(j) −
    * log p_raw(j) over `dim` buckets. Collects at most `dim` (bucket,
    * count) rows per corpus — bounded driver state, like the
    * classifier's gradient. */
  def lambdaWeights(target: DataFrame, raw: DataFrame, text: Column, dim: Int): Seq[Double] = {
    require(dim > 0, s"dim must be positive, got $dim")
    def counts(df: DataFrame): (Map[Long, Long], Long) = {
      val m = bucketCounts(df, text, dim).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      (m, m.values.sum)
    }
    val (ct, tTot) = counts(target)
    val (cr, rTot) = counts(raw)
    (0L until dim.toLong).map { j =>
      math.log((ct.getOrElse(j, 0L) + 1.0) / (tTot + dim)) -
        math.log((cr.getOrElse(j, 0L) + 1.0) / (rTot + dim))
    }
  }

  /** λ when the target is a SUBSET of the raw corpus (the common DSIR
    * setup: "select more documents like this labeled slice"): ONE
    * exploded pass computes both distributions — each feature
    * occurrence contributes to the raw count always and to the target
    * count conditionally — halving the corpus scans of
    * [[lambdaWeights]]. Same smoothing, same result. */
  def lambdaWeightsWithin(raw: DataFrame, isTarget: Column, text: Column, dim: Int): Seq[Double] = {
    require(dim > 0, s"dim must be positive, got $dim")
    val rows = raw.select(TextFunctions.tokens(text).as("__t"), isTarget.as("__is_t"))
      .select(featureBuckets(col("__t"), dim).as("__f"), col("__is_t"))
      .select(explode(col("__f")).as("bucket"), col("__is_t"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cr"), sum(when(col("__is_t"), 1L).otherwise(0L)).as("ct"))
      .collect()
    val cr = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ct = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    val rTot = cr.values.sum
    val tTot = ct.values.sum
    (0L until dim.toLong).map { j =>
      math.log((ct.getOrElse(j, 0L) + 1.0) / (tTot + dim)) -
        math.log((cr.getOrElse(j, 0L) + 1.0) / (rTot + dim))
    }
  }

  /** (doc_id, log_weight): Σ λ over the document's feature occurrences —
    * a zero-shuffle narrow map (λ rides as a literal array; the fold
    * runs over the staged in-row bucket array). */
  def scoreDocuments(df: DataFrame, id: Column, text: Column, lambda: Seq[Double]): DataFrame = {
    require(lambda.nonEmpty, "lambda must be non-empty")
    val lam = array(lambda.map(lit): _*)
    df.select(id.as("doc_id"), TextFunctions.tokens(text).as("__t"))
      .select(col("doc_id"), featureBuckets(col("__t"), lambda.size).as("__f"))
      .select(col("doc_id"),
        coalesce(
          aggregate(col("__f"), lit(0.0), (acc, f) =>
            acc + element_at(lam, (f + 1).cast("int"))),
          lit(0.0)).as("log_weight"))
  }

  /** λ as a (bucket, weight) table — the large-`dim` carrier. */
  def lambdaTable(spark: org.apache.spark.sql.SparkSession, lambda: Seq[Double]): DataFrame = {
    import spark.implicits._
    lambda.zipWithIndex.map { case (w, j) => (j.toLong, w) }.toDF("bucket", "weight")
  }

  /** Large-`dim` scoring path: a literal λ array beyond a few thousand
    * entries bloats generated code and plan size, so ship λ as a
    * broadcast (bucket, weight) table instead — explode the document's
    * feature buckets, hash-join λ (dim × 16 B broadcast), one
    * map-side-combined per-doc sum. Same result as [[scoreDocuments]]
    * up to float summation order (the spec pins ≤ 1e-9); docs whose
    * features all miss the table score 0 like the literal path's empty
    * fold. */
  def scoreDocumentsJoined(df: DataFrame, id: Column, text: Column,
                           lambdaDf: DataFrame, dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val base = df.select(id.as("doc_id"), TextFunctions.tokens(text).as("__t"))
      .select(col("doc_id"), featureBuckets(col("__t"), dim).as("__f"))
    val summed = base.select(col("doc_id"), explode(col("__f")).as("bucket"))
      .join(broadcast(lambdaDf.select(col("bucket"), col("weight"))), Seq("bucket"))
      .groupBy("doc_id").agg(sum("weight").as("log_weight"))
    base.select("doc_id").join(summed, Seq("doc_id"), "left")
      .withColumn("log_weight", coalesce(col("log_weight"), lit(0.0)))
  }

  /** Gumbel top-k importance resampling WITHOUT replacement: key_i =
    * log w_i + Gumbel(0,1), take the k largest — each subset is drawn
    * with probability proportional to its weights (the Gumbel-max
    * trick). The noise is hash-derived (`-ln(-ln(u))`, u from the md5
    * bucket of the id, half-bucket-centered so u ∈ (0,1) strictly) —
    * fully deterministic and engine-mirrorable. One TakeOrdered(k), no
    * global sort. */
  def gumbelTopK(scored: DataFrame, id: Column, logWeight: Column, k: Int,
                 salt: String = ""): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (graft.operators.Sampling.hashBucket(id, salt).cast("double") + 0.5) /
      graft.operators.Sampling.M.toDouble
    scored
      .select(id.as("doc_id"), logWeight.as("log_weight"),
        (logWeight + -log(-log(u))).as("__key"))
      .orderBy(col("__key").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("log_weight"))
  }
}
