package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance near-dup pairs over a term vocabulary via deletion
  * neighborhoods — the FastSS / SymSpell decomposition (Bocek et al.,
  * "Fast Similarity Search in Large Dictionaries", 2007): for
  * distance 1, ed(a,b) ≤ 1 ⟺ the deletion neighborhoods
  * K(s) = {s} ∪ {s with char i removed} intersect. Candidate
  * generation is therefore an EQUI-JOIN on deletion keys — never an
  * all-pairs levenshtein, which is |V|² and dead at any corpus-scale
  * vocabulary. The exact `levenshtein` verify then kills the false
  * candidates key-sharing admits (e.g. "ab"/"ba" share keys "a" and
  * "b" but sit at distance 2) — candidates are a superset, the verify
  * makes the result exact.
  *
  * The pipeline normalizes typo/inflection variants in a corpus
  * vocabulary ("recieve"/"receive", "cat"/"cats") — the token-level
  * sibling of D2's document-level MinHash→verify two-stage.
  *
  * Scale shape: vocabulary `distinct` collapses map-side; deletion
  * keys come from an `explode(sequence(...))` of POSITIONS followed by
  * a plain scalar substring projection — whole-stage-codegen'd (a
  * `transform` lambda would drop key generation to interpreted eval:
  * higher-order lambdas are CodegenFallback) — then a (term, key)
  * `distinct` (adjacent equal chars produce duplicate deletions; also
  * exactly mirrors the oracle's DISTINCT). The key table is
  * vocabulary-scale (Σ len+1 per distinct term), consumed by THREE
  * plans (df cap, both self-join sides), so its lineage is truncated
  * once ([[graft.operators.Lineage.truncate]]) instead of re-executing
  * the scan+distinct+explode per consumer. Per-key df rides a
  * partial-aggregating `groupBy(key)` joined back (the D28 discipline —
  * never a window over the key axis), and keys whose neighborhood
  * exceeds `keyDfCap` distinct terms are dropped whole (a pathological
  * key — e.g. a vocabulary of consecutive serial numbers — would
  * otherwise quadratically amplify the self-join; the cap is mirrored
  * by the oracle, not silent). The self-join and the pair `distinct`
  * (a pair can share several keys) are both key-hashed and
  * AQE-splittable.
  */
object EditDistance {

  /** All unordered term pairs within edit distance 1, with the exact
    * distance. `vocab` may contain duplicates and any other columns;
    * only `term` is read and it is distinct'ed first. Terms shorter
    * than `minLen` are excluded (short strings match everything at
    * distance 1 — "a"/"b" — and carry no signal). */
  def spellVariantPairs(vocab: DataFrame, term: Column, minLen: Int = 4,
                        keyDfCap: Int = 100): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    require(keyDfCap >= 2, s"keyDfCap must be >= 2, got $keyDfCap")
    val v = vocab.select(term.as("__w"))
      .filter(col("__w").isNotNull && length(col("__w")) >= minLen)
      .distinct()
    // i = 0..len-1 deletes char i+1; i = len reproduces the term itself
    // (substr past the end is ""), so one formula covers K(s) entirely.
    val keys = graft.operators.Lineage.truncate(
      v.select(col("__w"),
          explode(sequence(lit(0), length(col("__w")))).as("__i"))
        .select(col("__w"),
          concat(col("__w").substr(lit(1), col("__i")),
            col("__w").substr(col("__i") + lit(2), length(col("__w")))).as("__k"))
        .distinct())
    val good = keys.groupBy("__k").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= keyDfCap)
      .select("__k")
    val kd = keys.join(good, "__k")
    kd.as("x")
      .join(kd.as("y"),
        col("x.__k") === col("y.__k") && col("x.__w") < col("y.__w"))
      .select(col("x.__w").as("a"), col("y.__w").as("b"))
      .distinct()
      .filter(levenshtein(col("a"), col("b")) <= 1)
      .select(col("a"), col("b"),
        levenshtein(col("a"), col("b")).cast("int").as("dist"))
  }
}
