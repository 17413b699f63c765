package graft.text

import graft.dedup.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram novelty audit: how much of a document's n-gram content does a
  * reference corpus already contain? The memorization/overlap signal a
  * training-data pipeline needs in two directions — scoring GENERATED
  * text against the training corpus (verbatim-regurgitation detection)
  * and scoring CANDIDATE data against what is already ingested
  * (marginal-value triage). The complement of D25's decontamination:
  * there the overlap is removed, here it is MEASURED per document.
  *
  * Exact path: distinct per-doc gram hashes left-join the reference's
  * distinct gram set — gram-hash-keyed shuffle (8-byte md5-60 keys, the
  * [[Dedup.tokenHash60]] cross-engine discipline), partial-agg counts.
  * Scale path: the reference grams collapse into ONE broadcast Bloom
  * filter ([[graft.expressions.BloomSketch]]) probed inside the scan —
  * zero shuffle on the generated side and the reference never rescans;
  * false positives inflate `n_seen` by ≤ fpp, so the reported novelty
  * is a LOWER bound (the conservative direction for a memorization
  * alarm: Bloom can only make text look MORE memorized, never less).
  *
  * Documents with fewer than `n` tokens have no grams and are absent
  * from the output (mirrored by the SQL oracle). */
object Novelty {

  private def gramHashes(df: DataFrame, id: Column, text: Column, n: Int): DataFrame =
    df.select(id.as("doc_id"), TextFunctions.tokens(text).as("__toks"))
      .select(col("doc_id"), explode(TextFunctions.shinglesOf(col("__toks"), n)).as("__g"))
      .select(col("doc_id"), Dedup.tokenHash60(col("__g")).as("g"))

  /** Exact per-document novelty: (doc_id, n_grams, n_seen, novelty). */
  def ngramNovelty(gen: DataFrame, ref: DataFrame, id: Column, text: Column, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val refGrams = gramHashes(ref, id, text, n).select("g").distinct()
      .withColumn("__seen", lit(1L))
    gramHashes(gen, id, text, n)
      .join(refGrams, Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), sum(coalesce(col("__seen"), lit(0L))).as("n_seen"))
      .withColumn("novelty", lit(1.0) - col("n_seen") / col("n_grams"))
  }

  /** Bloom-pruned novelty at reference scale: same output schema, with
    * `n_seen` inflated by ≤ `fpp` (novelty is a lower bound). The
    * reference reduces to one filter of ~1.2·n·log2(1/fpp) bits,
    * broadcast once. */
  def ngramNoveltyBloom(
      gen: DataFrame, ref: DataFrame, id: Column, text: Column, n: Int,
      expectedGrams: Long, fpp: Double = 0.01): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    import graft.expressions.BloomSketch
    val bloomBytes = gramHashes(ref, id, text, n)
      .agg(BloomSketch.bloomAgg(col("g"), expectedGrams, fpp).as("b"))
      .head().getAs[Array[Byte]](0)
    val bc = gen.sparkSession.sparkContext.broadcast(bloomBytes)
    gramHashes(gen, id, text, n)
      .withColumn("__seen", when(BloomSketch.mightContain(bc, col("g")), 1L).otherwise(0L))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), sum(col("__seen")).as("n_seen"))
      .withColumn("novelty", lit(1.0) - col("n_seen") / col("n_grams"))
  }
}
