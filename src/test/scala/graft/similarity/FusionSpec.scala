package graft.similarity

import graft.{PlanShapes, SparkSpec}
import org.apache.spark.sql.functions._

class FusionSpec extends SparkSpec {
  import spark.implicits._

  test("RRF rewards cross-list agreement over single-list rank-1") {
    // list A: doc 10 first, doc 20 second; list B: doc 20 first, doc 30 second.
    // doc 20 (ranks 2+1) must beat doc 10 (rank 1 only) and doc 30.
    val a = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("qid", "id", "rank")
    val b = Seq((1L, 20L, 1L), (1L, 30L, 2L)).toDF("qid", "id", "rank")
    val got = Fusion.rrfFuse(Seq(a, b), topK = 10).orderBy("rank").collect()
    assert(got.map(_.getLong(1)).toSeq === Seq(20L, 10L, 30L))
    val r20 = got.find(_.getLong(1) == 20L).get
    assert(math.abs(r20.getDouble(2) - (1.0 / 62 + 1.0 / 61)) < 1e-12)
    assert(r20.getLong(3) === 2L) // n_lists
    assert(got.find(_.getLong(1) == 10L).get.getLong(3) === 1L)
  }

  test("queries are isolated; ties break on id asc; topK cuts") {
    val a = Seq((1L, 5L, 1L), (1L, 6L, 2L), (2L, 7L, 1L)).toDF("qid", "id", "rank")
    val b = Seq((1L, 6L, 1L), (1L, 5L, 2L), (2L, 8L, 1L)).toDF("qid", "id", "rank")
    // q1: ids 5 and 6 have identical fused scores (1/61 + 1/62) → id asc
    val q1 = Fusion.rrfFuse(Seq(a, b), topK = 1).filter(col("qid") === 1).collect()
    assert(q1.length === 1 && q1.head.getLong(1) === 5L)
    val q2 = Fusion.rrfFuse(Seq(a, b), topK = 5).filter(col("qid") === 2)
      .orderBy("rank").collect()
    assert(q2.map(_.getLong(1)).toSeq === Seq(7L, 8L))
  }

  test("single list degenerates to the input order; plan has one window") {
    val a = Seq((1L, 5L, 1L), (1L, 6L, 2L), (1L, 7L, 3L)).toDF("qid", "id", "rank")
    val fused = Fusion.rrfFuse(Seq(a), topK = 2)
    assert(fused.orderBy("rank").collect().map(_.getLong(1)).toSeq === Seq(5L, 6L))
    assert(PlanShapes.windowCount(fused) === 1)
  }

  test("empty lists fuse to empty") {
    val a = Seq.empty[(Long, Long, Long)].toDF("qid", "id", "rank")
    assert(Fusion.rrfFuse(Seq(a, a), topK = 3).count() === 0)
  }
}
