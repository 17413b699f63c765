package graft.similarity

import graft.vectors.VectorOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-class embedding-space QA: are the vectors carrying a label
  * actually CLUSTERED around their class, and how far is the nearest
  * competing class? The training-data read on a degraded answer:
  * mislabeled examples, a class that collapsed in embedding space, or
  * a near-duplicate class pair that should be merged before training a
  * classifier head on the labels — the label-level companion of D53's
  * per-vector outlier QA and D38's similarity-based dedup.
  */
object Cohesion {

  /** Per-label report over `(id, vec, label)`:
    * `n`, `cohesion` = avg cosine(vec, own-label centroid),
    * `separation` = avg over vectors of max cosine(vec, OTHER-label
    * centroid), `margin` = cohesion − separation (negative margin:
    * the average member sits closer to a competing centroid than to
    * its own — the class is not separable in this space).
    *
    * Scale shape: centroids via `posexplode` + (label, dim) partial
    * aggregate — the n×dims explosion is the one heavy stage and it
    * partial-aggregates before the shuffle; centroids themselves are
    * labels×dims tiny, so the score stage is ONE broadcast
    * nested-loop over L centroids per vector (exact, fine for the
    * label-cardinality regime this report serves; a million-cluster
    * assignment is D23's IVF job, not a QA report). Values whose max
    * competing cosine is reported by VALUE only — never the argmax
    * label — so near-tied centroids cannot flip the output. */
  def labelCohesion(emb: DataFrame, id: Column, vec: Column, label: Column): DataFrame = {
    val base = emb.select(id.as("__id"), label.as("__l"),
      VectorOps.toDouble(vec).as("__v"))
    val cells = base
      .select(col("__l"), posexplode(col("__v")).as(Seq("__p", "__x")))
      .groupBy(col("__l"), col("__p")).agg(avg(col("__x")).as("__c"))
    val centroids = cells
      .groupBy(col("__l").as("__cl"))
      .agg(transform(array_sort(collect_list(struct(col("__p"), col("__c")))),
        s => s.getField("__c")).as("__cv"))
    val scored = base.crossJoin(broadcast(centroids))
      .select(col("__id"), col("__l"), col("__cl"),
        VectorOps.cosine(col("__v"), col("__cv")).as("__cos"))
    val perVec = scored.groupBy(col("__id"), col("__l"))
      .agg(max(when(col("__l") === col("__cl"), col("__cos"))).as("__own"),
        max(when(col("__l") =!= col("__cl"), col("__cos"))).as("__other"))
    perVec.groupBy(col("__l").as("label"))
      .agg(count(lit(1)).as("n"),
        avg(col("__own")).as("cohesion"),
        avg(col("__other")).as("separation"),
        avg(col("__own") - col("__other")).as("margin"))
  }
}
