package graft.operators

import graft.text.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch construction: assign documents to
  * fixed-token-budget packs so downstream batch assembly reads
  * contiguous, budget-sized groups.
  *
  * Packing is inherently sequential, so it is SHARDED for scale: each of
  * `nShards` hash shards packs independently in doc-id order (one window
  * per shard — the shuffle is keyed by shard, and 100 TB packs as wide
  * as the shard count). Within a shard the rule is contiguous
  * prefix-sum packing: a document joins the pack its running token count
  * starts in (`floor(exclusive_prefix / budget)`), so every pack except
  * a shard's last holds ≥ budget tokens and overflows by less than one
  * document — the standard streaming approximation of bin packing
  * (optimal packing is NP-hard and non-deterministic under parallelism).
  */
object Packing {

  /** (doc_id, shard, n_tokens, pack_id). Deterministic for a fixed
    * corpus: shard = doc_id mod nShards, packing order = doc_id. */
  def packSequences(df: DataFrame, id: Column, text: Column, budget: Long, nShards: Int): DataFrame = {
    require(budget > 0 && nShards > 0, "budget and nShards must be positive")
    val staged = df.select(id.as("doc_id"),
      pmod(id, lit(nShards.toLong)).as("shard"),
      TextFunctions.tokenCount(text).as("n_tokens"))
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged.withColumn("__cum", sum("n_tokens").over(w))
      .withColumn("pack_id", floor((col("__cum") - col("n_tokens")) / lit(budget)).cast("long"))
      .drop("__cum")
  }

  /** Per-pack rollup: documents and token totals per (shard, pack). */
  def packStats(packed: DataFrame): DataFrame =
    packed.groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))

  /** Training-ready pack manifest (D17b): one row per (shard, pack)
    * with the ordered member documents and their cumulative-length
    * boundaries — `cu_seqlens` in flash-attention/packed-batch
    * convention: `[0, n₁, n₁+n₂, …, Σn]`, length `n_docs + 1`, so the
    * batch assembler slices sequence i as
    * `[cu_seqlens(i), cu_seqlens(i+1))` with zero per-doc metadata
    * lookups. Built from [[packSequences]] output by one hash aggregate
    * (`sort_array ∘ collect_list` — the buffer is one pack's documents,
    * bounded by budget/min-doc-tokens, never corpus-sized) and an
    * in-plan running-sum fold over that bounded array. */
  def packManifest(packed: DataFrame): DataFrame =
    packed.groupBy("shard", "pack_id")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n_tokens")))).as("__ds"))
      .select(col("shard"), col("pack_id"),
        size(col("__ds")).cast("long").as("n_docs"),
        transform(col("__ds"), s => s.getField("doc_id")).as("doc_ids"),
        aggregate(
          transform(col("__ds"), s => s.getField("n_tokens")),
          struct(array(lit(0L)).as("offs"), lit(0L).as("tot")),
          (acc, n) => struct(
            concat(acc.getField("offs"), array(acc.getField("tot") + n)).as("offs"),
            (acc.getField("tot") + n).as("tot")),
          acc => acc.getField("offs")).as("cu_seqlens"))
      .withColumn("sum_tokens", element_at(col("cu_seqlens"), -1))

  /** Balanced output sharding by token cost — fix the shard COUNT and
    * equalize per-shard token totals (the writer-side complement of
    * [[packSequences]], which fixes the pack SIZE): imbalance in a
    * hash-sharded corpus comes almost entirely from the heavy tail, so
    * the HEAD (the `headSize` costliest documents, taken via
    * `orderBy().limit()` = TakeOrderedAndProject — per-partition top-k,
    * no global sort) is striped serpentine over cost-descending rank
    * (rank r → position (r−1) mod 2S, folded: the classic
    * boustrophedon heuristic that pairs a big doc with a small one),
    * and the TAIL assigns by [[Sampling.hashBucket]] mod S — law of
    * large numbers balances it, deterministically and
    * layout-independently. The window rank runs over `headSize` ROWS,
    * not the corpus; head assignments broadcast back. Adds `shard`;
    * every rule is engine-replayable (no greedy state, no RNG). */
  def assignBalancedShards(df: DataFrame, key: Column, cost: Column,
                           shards: Int, headSize: Int = 0, salt: String = ""): DataFrame = {
    require(shards >= 1, s"need shards >= 1, got $shards")
    val head = if (headSize > 0) headSize else 4 * shards
    Seq("shard", "__rk", "__hshard").foreach(c => require(!df.columns.contains(c),
      s"assignBalancedShards reserves column '$c'; rename the input column"))
    val top = df.select(key.as("__k"), cost.cast("long").as("__c"))
      .orderBy(col("__c").desc, col("__k").asc).limit(head)
    val rk = row_number().over(Window.orderBy(col("__c").desc, col("__k").asc))
    val pos = (rk - 1) % (2 * shards)
    val headAssign = top
      .withColumn("__rk", rk)
      .withColumn("__hshard",
        when(pos < shards, pos).otherwise(lit(2 * shards - 1) - pos).cast("int"))
      .select(col("__k"), col("__hshard"))
    df.join(broadcast(headAssign), key === col("__k"), "left")
      .withColumn("shard",
        coalesce(col("__hshard"),
          (Sampling.hashBucket(key, salt) % shards).cast("int")))
      .drop("__k", "__hshard")
  }
}
