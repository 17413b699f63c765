package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Collocation mining: adjacent-bigram pointwise mutual information
  * over the corpus — which word pairs co-occur far above chance
  * ("new york", "machine learning"). PMI(w₁,w₂) = ln(c₁₂·N / (c₁·c₂))
  * with all counts measured on the bigram stream (c₁ = bigrams whose
  * first word is w₁, c₂ = bigrams whose second word is w₂, N = total
  * bigrams) — one self-consistent sample space, no unigram/bigram
  * denominator mismatch at document edges.
  *
  * Scale shape: the tokens array is STAGED once per document and
  * bigram emission is an `explode(sequence(...))` over positions plus
  * scalar `element_at`s — codegen'd, never a HOF lambda and never the
  * re-tokenize-per-element O(n²) trap ([[TextFunctions.collapseRuns]]
  * note). Bigram counts partial-aggregate map-side (the Zipf head
  * collapses in the combiner); margins c₁/c₂ derive FROM the bigram-
  * type table (vocabulary²-bounded, never a corpus rescan), joined
  * back key-hashed (hot heads AQE-splittable); only the one-row N
  * broadcasts. PMI uses the product-free log decomposition
  * ln c₁₂ + ln N − ln c₁ − ln c₂ (no overflow at any scale).
  *
  * `minCount` prunes rare pairs BEFORE the margin joins — low-count
  * bigrams have unstable PMI (a hapax pair maxes the score) and are
  * the classic collocation-list noise. */
object Collocations {

  /** (w1, w2, cnt, pmi) for adjacent bigrams with cnt ≥ minCount. */
  def pmiCollocations(docs: DataFrame, text: Column,
                      minCount: Long = 5L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val toks = docs
      .select(filter(TextFunctions.tokens(text), w => length(w) > 0).as("__t"))
      .filter(size(col("__t")) >= 2)
    val pairs = toks
      .select(col("__t"), explode(sequence(lit(1), size(col("__t")) - 1)).as("__i"))
      .select(element_at(col("__t"), col("__i")).as("w1"),
        element_at(col("__t"), col("__i") + 1).as("w2"))
    // the bigram-type table feeds FOUR plans (both margins, N, the
    // final join) and column pruning specializes each consumer's
    // aggregate (B21 lesson), so the vocab²-bounded table is truncated
    // once — exactly one corpus scan + one explosion, plan-pinned
    val big = graft.operators.Lineage.truncate(
      pairs.groupBy("w1", "w2").agg(count(lit(1)).as("cnt")))
    val c1 = big.groupBy("w1").agg(sum("cnt").as("__c1"))
    val c2 = big.groupBy("w2").agg(sum("cnt").as("__c2"))
    val n = big.agg(sum("cnt").as("__nb"))
    big.filter(col("cnt") >= minCount)
      .join(c1, "w1").join(c2, "w2").crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("cnt"),
        (log(col("cnt")) + log(col("__nb")) - log(col("__c1")) - log(col("__c2")))
          .as("pmi"))
  }
}
