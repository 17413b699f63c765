package graft.similarity

import graft.operators.Relational
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval: combine per-query ranked lists
  * from heterogeneous scorers (BM25 lexical, embedding cosine, ...)
  * without calibrating their incomparable score scales. Reciprocal
  * Rank Fusion (Cormack et al., SIGIR 2009): each list contributes
  * `1/(k + rank)` and the fused score is the sum — rank-only, so a
  * scorer with inflated magnitudes cannot dominate, and documents
  * surfaced by SEVERAL retrievers beat one-retriever champions.
  *
  * Scale shape: union of the ranked lists (each already top-k-per-query
  * — candidate volume is `queries × k × lists`, never corpus-sized),
  * ONE (qid, id) hash aggregate with partial aggregation, one per-qid
  * window over ≤ k·lists rows per query. The expensive part of hybrid
  * retrieval is producing the input rankings (D54 BM25, D5/D6/D23
  * ANN); fusion itself adds no corpus-sized stage at any scale.
  */
object Fusion {

  /** Fuse ranked lists, each exposing (qid, id, rank) with rank 1-based
    * and unique per (list, qid). Emits per qid the `topK` fused rows:
    * (qid, id, rrf, n_lists, rank) ordered by (rrf desc, id asc) —
    * `n_lists` = how many input lists surfaced the id (the agreement
    * signal RRF rewards). `kRrf` is the standard dampener (60): small
    * values over-reward rank-1 hits, large values flatten toward
    * list-membership counting. */
  def rrfFuse(rankings: Seq[DataFrame], topK: Int, kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranked list")
    require(topK >= 1 && kRrf >= 1, s"topK and kRrf must be >= 1, got $topK, $kRrf")
    val tagged = rankings.map(_.select(col("qid"), col("id"), col("rank")))
      .reduce(_ unionAll _)
    val scored = tagged.groupBy("qid", "id")
      .agg(sum(lit(1.0) / (lit(kRrf) + col("rank"))).as("rrf"),
        count(lit(1)).as("n_lists"))
    Relational.topKPerGroup(scored,
        Seq(col("qid")), Seq(col("rrf").desc, col("id").asc), topK)
      .withColumnRenamed("rn", "rank")
  }
}
