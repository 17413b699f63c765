package graft.similarity

import graft.vectors.VectorOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Margin-based aligned-pair mining — the parallel-corpus / duplicate-
  * pair criterion of Artetxe & Schwenk 2019 (LASER, CCMatrix): a raw
  * cosine threshold fails in dense neighborhoods (hubs clear any global
  * bar) and starves sparse ones; the MARGIN rescales each candidate by
  * the two endpoints' local neighborhood density,
  *
  *   margin(x, y) = cos(x, y) / ((avgTopK(x) + avgTopK(y)) / 2)
  *
  * so a pair only survives when it stands OUT of both sides' top-k
  * backgrounds (margin > 1 ⇔ closer than the local average). The
  * canonical mining step for translation pairs, near-duplicate
  * question/answer alignment, and cross-source entity matching.
  *
  * Plan shape: candidates are the cross-group pair scores (the d5/d58
  * bounded-sweep class — broadcast the smaller group; at 10^9 × 10^9
  * swap candidate generation to IVF probes per [[Ann.hardNegativesIvf]]
  * and the margins compose unchanged); each side's top-k background is
  * a per-endpoint window average over its candidate rows — both windows
  * partition on an endpoint id, so they distribute. Ties in the top-k
  * rank break by the other endpoint's id (deterministic, engine-
  * mirrorable). */
object Mining {

  /** (a_id, b_id, cos, margin) for every cross-group candidate whose
    * margin ≥ `minMargin`, groups taken from `group` (exactly the rows
    * of `groupA` vs `groupB`). `k` bounds each endpoint's background
    * average (fewer candidates than k ⇒ average over what exists). */
  def marginPairs(
      df: DataFrame, id: String, vec: String, group: String,
      groupA: Any, groupB: Any, k: Int, minMargin: Double): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val a = df.filter(col(group) === lit(groupA))
      .select(col(id).as("a_id"), VectorOps.toDouble(col(vec)).as("__av"))
      .withColumn("__an", VectorOps.l2Norm(col("__av")))
    val b = df.filter(col(group) === lit(groupB))
      .select(col(id).as("b_id"), VectorOps.toDouble(col(vec)).as("__bv"))
      .withColumn("__bn", VectorOps.l2Norm(col("__bv")))
    val scored = a.join(broadcast(b))
      .withColumn("cos",
        VectorOps.cosineWithNorms(col("__av"), col("__bv"), col("__an"), col("__bn")))
      .select(col("a_id"), col("b_id"), col("cos"))
    val wa = Window.partitionBy("a_id").orderBy(col("cos").desc, col("b_id").asc)
    val wb = Window.partitionBy("b_id").orderBy(col("cos").desc, col("a_id").asc)
    val backed = scored
      .withColumn("__ra", row_number().over(wa))
      .withColumn("__rb", row_number().over(wb))
      .withColumn("__bg_a",
        avg(when(col("__ra") <= k, col("cos"))).over(Window.partitionBy("a_id")))
      .withColumn("__bg_b",
        avg(when(col("__rb") <= k, col("cos"))).over(Window.partitionBy("b_id")))
    backed
      // a non-positive background (pathological all-negative
      // neighborhoods) makes the ratio meaningless — margin null there,
      // and the filter drops it rather than sign-flipping
      .withColumn("__bg", (col("__bg_a") + col("__bg_b")) / 2.0)
      .withColumn("margin", when(col("__bg") > 0, col("cos") / col("__bg")))
      .filter(col("margin") >= minMargin)
      .select(col("a_id"), col("b_id"), col("cos"), col("margin"))
  }
}
