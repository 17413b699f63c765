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
}
