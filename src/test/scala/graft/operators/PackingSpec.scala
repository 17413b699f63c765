package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences fills packs in doc order up to the budget") {
    // one shard; token counts 3,3,3,3 with budget 6 → packs (0,0),(1,1)
    val docs = Seq(
      (0L, "a b c"), (8L, "d e f"), (16L, "g h i"), (24L, "j k l"))
      .toDF("doc_id", "text")
    val packed = Packing.packSequences(docs, col("doc_id"), col("text"), budget = 6, nShards = 8)
      .orderBy("doc_id")
      .select("doc_id", "shard", "pack_id").as[(Long, Long, Long)].collect()
    assert(packed.toSeq == Seq((0L, 0L, 0L), (8L, 0L, 0L), (16L, 0L, 1L), (24L, 0L, 1L)))
  }

  test("a straddling document joins the pack it starts in (bounded overflow)") {
    // tokens 4, 4 with budget 6: doc2 starts at offset 4 (< 6) → pack 0
    val docs = Seq((0L, "a b c d"), (8L, "e f g h")).toDF("doc_id", "text")
    val stats = Packing.packStats(
        Packing.packSequences(docs, col("doc_id"), col("text"), budget = 6, nShards = 8))
      .select("pack_id", "n_docs", "sum_tokens").as[(Long, Long, Long)].collect()
    assert(stats.toSeq == Seq((0L, 2L, 8L))) // one pack, overflow < one doc
  }

  test("packManifest emits ordered members and cu_seqlens slicing boundaries") {
    // one shard, tokens 3,4,2 with budget 6 → pack0 = {0,8} (3+4), pack1 = {16}
    val docs = Seq((0L, "a b c"), (8L, "d e f g"), (16L, "h i")).toDF("doc_id", "text")
    val m = Packing.packManifest(
        Packing.packSequences(docs, col("doc_id"), col("text"), budget = 6, nShards = 8))
      .orderBy("pack_id")
      .select("pack_id", "n_docs", "doc_ids", "cu_seqlens", "sum_tokens")
      .as[(Long, Long, Seq[Long], Seq[Long], Long)].collect()
    assert(m.length == 2)
    assert(m(0) == ((0L, 2L, Seq(0L, 8L), Seq(0L, 3L, 7L), 7L)))
    assert(m(1) == ((1L, 1L, Seq(16L), Seq(0L, 2L), 2L)))
    // the slicing contract: cu_seqlens has n_docs+1 entries, starts at
    // 0, ends at sum_tokens, and consecutive deltas are the doc lengths
    m.foreach { case (_, n, ids, cu, tot) =>
      assert(cu.length == n + 1 && cu.head == 0L && cu.last == tot)
      assert(ids.sorted == ids, "members must be in packing (doc_id) order")
    }
  }

  test("shards pack independently") {
    val docs = Seq((0L, "a b"), (1L, "c d"), (2L, "e f")).toDF("doc_id", "text")
    val packed = Packing.packSequences(docs, col("doc_id"), col("text"), budget = 2, nShards = 3)
      .select("doc_id", "shard", "pack_id").as[(Long, Long, Long)].collect().toSet
    assert(packed == Set((0L, 0L, 0L), (1L, 1L, 0L), (2L, 2L, 0L))) // each shard starts at pack 0
  }

  test("assignBalancedShards: serpentine head spreads the heavies, tail hash-balances") {
    val rows = ((1L to 4L).map(i => (i, 1000L)) ++ (5L to 200L).map(i => (i, 10L)))
      .toDF("doc_id", "cost")
    val out = Packing.assignBalancedShards(rows, col("doc_id"), col("cost"),
        shards = 4, headSize = 8)
      .select("doc_id", "cost", "shard").as[(Long, Long, Int)].collect().toSeq
    assert(out.map(_._3).forall(s => s >= 0 && s < 4))
    // ranks 1-4 are the heavies → serpentine positions 0,1,2,3 → one per shard
    val heavyShards = out.filter(_._2 == 1000L).map(_._3).sorted
    assert(heavyShards == Seq(0, 1, 2, 3), s"heavies landed on $heavyShards")
    // ranks 5-8 (docs 5,6,7,8) fold back 3,2,1,0
    val fold = out.filter(r => r._1 >= 5L && r._1 <= 8L).sortBy(_._1).map(_._3)
    assert(fold == Seq(3, 2, 1, 0), s"fold-back ranks got $fold")
    val totals = out.groupBy(_._3).values.map(_.map(_._2).sum).toSeq
    assert(totals.max.toDouble / totals.min < 1.3, s"imbalanced: $totals")
  }

  test("assignBalancedShards is layout-independent and total-preserving") {
    val rows = (1L to 300L).map(i => (i, (i * 13 % 97) + 1)).toDF("doc_id", "cost")
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.assignBalancedShards(df, col("doc_id"), col("cost"), shards = 5)
        .select("doc_id", "shard").as[(Long, Int)].collect().toMap
    val a = run(rows)
    assert(a == run(rows.repartition(7)), "assignment must not depend on layout")
    assert(a.size == 300)
  }
}
