package graft.similarity

import graft.vectors.VectorOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns.
  *
  * Two tiers:
  *  - [[bruteForceTopK]] — exact cosine top-k: the correctness baseline.
  *    The (small) query set is broadcast against the corpus; per
  *    (query, candidate) cosine is a codegen-friendly expression; top-k
  *    per query is a `row_number` window over the query id.
  *  - [[lshTopK]] — random-hyperplane LSH: the 100 TB path. Corpus rows
  *    are bucketed by sign-bit signatures across several tables;
  *    exact cosine runs only inside colliding buckets, so per-query cost
  *    is O(bucket) instead of O(corpus).
  */
object Ann {

  /** Exact cosine top-k for each row of `queries` against `corpus`.
    *
    * Scale: `broadcast(queries)` keeps the join shuffle-free (a
    * BroadcastNestedLoopJoin over the corpus scan); norms are
    * precomputed per side so each pair costs one dot product. The
    * window on `qid` shuffles only (qid, cid, cos) triples. For large
    * query sets, chunk the queries and union.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, id: String, vec: String, k: Int): DataFrame = {
    val c = corpus.select(col(id).as("cid"), VectorOps.toDouble(col(vec)).as("cv"))
      .withColumn("cnorm", VectorOps.l2Norm(col("cv")))
    val q = queries.select(col(id).as("qid"), VectorOps.toDouble(col(vec)).as("qv"))
      .withColumn("qnorm", VectorOps.l2Norm(col("qv")))
    val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("cos", VectorOps.cosineWithNorms(col("qv"), col("cv"), col("qnorm"), col("cnorm")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), round(col("cos"), 4).as("cosine"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane coefficient for
    * (table, plane, dim): a fixed-seed hash mapped to [-1, 1). No RNG
    * state — executors regenerate identical planes. */
  private def planeCoef(table: Int, plane: Int, dim: Int): Double = {
    var h = (table.toLong * 0x100000L + plane.toLong * 0x1000L + dim.toLong) * 0x9E3779B97F4A7C15L
    h ^= (h >>> 32); h *= 0xBF58476D1CE4E5B9L; h ^= (h >>> 29)
    (Math.floorMod(h, 2000001L) - 1000000L).toDouble / 1000000.0
  }

  /** Sign-bit signature of `v` under `bits` hyperplanes of table `t`,
    * encoded "t_b₀b₁…" so signatures from different tables never collide. */
  def hyperplaneSignature(v: Column, dims: Int, t: Int, bits: Int): Column = {
    val bitCols = (0 until bits).map { p =>
      val plane = array((0 until dims).map(d => lit(planeCoef(t, p, d))): _*)
      when(VectorOps.dot(v, plane) > 0, lit("1")).otherwise(lit("0"))
    }
    concat_ws("", lit(s"${t}_") +: bitCols: _*)
  }

  /** LSH-bucketed ANN: exact cosine top-k within the union of the
    * query's buckets across `tables` signature tables.
    *
    * Plan shape: signatures are narrow maps; candidate generation is an
    * equi-join on the signature string (shuffle keyed by bucket);
    * duplicates from multi-table collisions collapse via max(cos) —
    * cosine is identical for every collision of a pair. Recall/cost is
    * tuned by (tables, bits): more tables → higher recall, fewer bits →
    * bigger buckets.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, id: String, vec: String,
              dims: Int, k: Int, tables: Int = 8, bits: Int = 8): DataFrame = {
    def signed(df: DataFrame, idAs: String, vecAs: String): DataFrame = {
      val base = df.select(col(id).as(idAs), VectorOps.toDouble(col(vec)).as(vecAs))
        .withColumn(s"${idAs}_norm", VectorOps.l2Norm(col(vecAs)))
      base.withColumn("sig", explode(array(
        (0 until tables).map(t => hyperplaneSignature(col(vecAs), dims, t, bits)): _*)))
    }
    val c = signed(corpus, "cid", "cv")
    val q = signed(queries, "qid", "qv")
    val cand = c.join(q, Seq("sig")).filter(col("qid") =!= col("cid"))
      .withColumn("cos", VectorOps.cosineWithNorms(col("qv"), col("cv"), col("qid_norm"), col("cid_norm")))
      .groupBy("qid", "cid").agg(max("cos").as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), round(col("cos"), 4).as("cosine"), col("rank"))
  }

  /** Embedding near-duplicate pairs: corpus self-match where
    * cosine ≥ `threshold`, candidates restricted to LSH bucket
    * collisions (same plan discipline as [[lshTopK]] — equi-join on the
    * bucket, never cartesian). */
  def embeddingNearDupPairs(corpus: DataFrame, id: String, vec: String,
                            dims: Int, threshold: Double,
                            tables: Int = 8, bits: Int = 8): DataFrame = {
    val base = corpus.select(col(id).as("vid"), VectorOps.toDouble(col(vec)).as("v"))
      .withColumn("norm", VectorOps.l2Norm(col("v")))
    val sig = base.withColumn("sig", explode(array(
      (0 until tables).map(t => hyperplaneSignature(col("v"), dims, t, bits)): _*)))
    val a = sig.select(col("sig"), col("vid").as("doc_a"), col("v").as("va"), col("norm").as("na"))
    val b = sig.select(col("sig"), col("vid").as("doc_b"), col("v").as("vb"), col("norm").as("nb"))
    a.join(b, Seq("sig")).filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(max(VectorOps.cosineWithNorms(col("va"), col("vb"), col("na"), col("nb"))).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("cos"), 4).as("cosine"))
  }
}
