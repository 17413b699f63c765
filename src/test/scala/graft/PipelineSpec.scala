package graft

import graft.dedup.Dedup
import graft.operators.Packing
import graft.text.{Chunking, TextFunctions}
import org.apache.spark.sql.functions._

/** Capstone: the composed training-data pipeline a user of this library
  * would actually run — dedup → quality filter → decontaminate → chunk
  * → pack — end-to-end over the real test corpus, with the invariants
  * each stage owes the next asserted at the seams. Every stage here is
  * individually oracled/specced; this test pins that they COMPOSE
  * (column contracts line up, nothing double-drops, reruns are
  * deterministic).
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("dedup → quality filter → decontaminate → chunk → pack composes end-to-end") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val evalSet = docs.filter(col("doc_id") % 50 === 0)

    // 1. exact dedup: one survivor per content group
    val deduped = Dedup.exactDedup(docs, col("doc_id"), col("text"))
    val nDeduped = deduped.count()
    assert(nDeduped > 0 && nDeduped <= docs.count())
    assert(deduped.select(TextFunctions.contentFingerprint(col("text"))).distinct().count() == nDeduped)

    // 2. quality floor: drop the bottom of the quality distribution
    val scored = deduped.withColumn("__q", TextFunctions.qualityScore(col("text")))
    val kept = scored.filter(col("__q") >= 0.2).drop("__q")
    assert(kept.count() > 0)

    // 3. decontaminate against the eval set: the training side is the
    // NON-eval documents (eval docs themselves never enter training),
    // and contaminated ones are dropped from it
    val trainSide = kept.filter(col("doc_id") % 50 =!= 0)
    val report = Dedup.contaminationReport(trainSide, evalSet, col("doc_id"), col("text"))
    val contaminated = report.filter(col("contaminated")).select(col("doc_id").as("__cdoc"))
    val clean = trainSide.join(contaminated, col("doc_id") === col("__cdoc"), "left_anti")
    assert(clean.count() == trainSide.count() - contaminated.count())
    // no eval document and no contaminated document survives into training
    assert(clean.filter(col("doc_id") % 50 === 0).isEmpty)
    assert(clean.join(contaminated, col("doc_id") === col("__cdoc"), "left_semi").isEmpty)

    // 4. chunk to the context window
    val chunks = Chunking.chunkDocuments(clean, col("doc_id"), col("text"), 32, 8)
    assert(chunks.filter(col("n_tokens") > 32).isEmpty, "no chunk may exceed the window")

    // 5. pack chunks into token budgets (chunk_text re-keyed per chunk)
    val packed = Packing.packSequences(
      chunks.select(
        (col("doc_id") * 10000000 + col("chunk_id")).as("chunk_key"), col("chunk_text")),
      col("chunk_key"), col("chunk_text"), budget = 256, nShards = 4)
    assert(packed.count() == chunks.count(), "every chunk lands in exactly one pack")
    val overPacked = Packing.packStats(packed).filter(col("sum_tokens") > 256 + 32)
    assert(overPacked.isEmpty, "no pack may exceed budget by more than one chunk")

    // determinism: the full composition yields byte-identical results on rerun
    val rerun = Packing.packSequences(
      Chunking.chunkDocuments(clean, col("doc_id"), col("text"), 32, 8)
        .select((col("doc_id") * 10000000 + col("chunk_id")).as("chunk_key"), col("chunk_text")),
      col("chunk_key"), col("chunk_text"), budget = 256, nShards = 4)
    assert(packed.orderBy("chunk_key").collect().toSeq ==
      rerun.orderBy("chunk_key").collect().toSeq)
  }

  test("near-dup clusters → keep-one → rebalance → cluster-keyed split composes") {
    import graft.operators.Sampling
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")

    // 1. near-dup pairs → connected components; EVERY doc gets a label
    // (docs in no pair are their own cluster)
    val pairs = Dedup.jaccardVerify(
      Dedup.minHashCandidates(docs, col("doc_id"), col("text"), 32, 8),
      docs, col("doc_id"), col("text"), threshold = 0.5)
    val labels = Dedup.clusterPairs(pairs)
    val labeled = docs.join(labels, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))

    // 2. keep one doc per cluster (the representative)
    val kept = labeled.filter(col("doc_id") === col("cluster_id"))
    assert(kept.count() == labeled.select("cluster_id").distinct().count())

    // 3. rebalance the kept corpus to a target language mix
    val langs = kept.select("lang").distinct().as[String].collect().toSet
    val mix = langs.map(_ -> 1.0 / langs.size).toMap
    val balanced = Sampling.rebalanceToMix(kept, col("doc_id"), col("lang"), mix)
    val counts = balanced.groupBy("lang").count().as[(String, Long)].collect().toMap
    val maxDev = counts.values.map(_.toDouble / counts.values.sum - 1.0 / langs.size)
      .map(math.abs).max
    assert(maxDev < 0.1, s"mix off target: $counts")

    // 4. cluster-keyed split: near-dups (had any survived) CANNOT
    // straddle train/eval — key the assignment on the cluster label
    val split = balanced.withColumn("split",
      Sampling.assignSplit(col("cluster_id"), Seq("train" -> 0.9, "eval" -> 0.1)))
    val byCluster = split.groupBy("cluster_id")
      .agg(countDistinct("split").as("n_splits"))
    assert(byCluster.filter(col("n_splits") > 1).isEmpty)
    // deterministic on rerun
    val rerun = balanced.withColumn("split",
      Sampling.assignSplit(col("cluster_id"), Seq("train" -> 0.9, "eval" -> 0.1)))
    assert(split.select("doc_id", "split").orderBy("doc_id").collect().toSeq ==
      rerun.select("doc_id", "split").orderBy("doc_id").collect().toSeq)
  }
}
