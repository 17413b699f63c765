package graft

import org.apache.spark.sql.functions._

/** Empty-input hardening: a 100 TB pipeline routinely feeds operators
  * empty slices (an empty micro-batch, a filter that matched nothing, a
  * bootstrap run before any data landed). Every operator must return an
  * empty, correctly-SCHEMAED result — not throw, not return null — so
  * composed pipelines and streaming sinks survive the empty case
  * without special-casing it.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private lazy val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")

  test("dedup operators accept an empty corpus") {
    import graft.dedup.Dedup
    assert(Dedup.exactDedup(noDocs, col("doc_id"), col("text")).count() == 0)
    assert(Dedup.minHashCandidates(noDocs, col("doc_id"), col("text")).count() == 0)
    assert(Dedup.jaccardPairs(noDocs, col("doc_id"), col("text"), 0.5).count() == 0)
    assert(Dedup.simHashPairs(noDocs, col("doc_id"), col("text")).count() == 0)
    assert(Dedup.duplicatedSpanStats(noDocs, col("doc_id"), col("text"), w = 4).count() == 0)
    val clusters = Dedup.clusterPairs(Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"))
    assert(clusters.columns.toSeq == Seq("doc_id", "cluster_id") && clusters.count() == 0)
  }

  test("similarity operators accept an empty corpus") {
    import graft.similarity.Ann
    // nLists=1 keeps ivfCentroids' LIMIT sample valid on zero rows
    val dedup = Ann.semanticDedup(noVecs, "vec_id", "embedding", 0.9, nLists = 1)
    assert(dedup.columns.toSeq == Seq("vid", "list_id", "kept") && dedup.count() == 0)
    assert(Ann.embeddingNearDupPairs(noVecs, "vec_id", "embedding", dims = 4, threshold = 0.9,
      bits = 2).count() == 0)
    val hier = Ann.hierCentroids(noVecs, "vec_id", "embedding", nLists = 4, trainRounds = 1)
    assert(hier.top.count() == 0 && hier.sub.count() == 0)
    assert(Ann.ivfAssignHier(noVecs, "vec_id", "embedding", hier).count() == 0)
  }

  test("hierarchical IVF degenerate sizes: nLists=1 and searchTop beyond cell count") {
    import graft.similarity.Ann
    val four = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.9f, 0.1f)), (4L, Array(0.1f, 0.9f))).toDF("vec_id", "embedding")
    // nLists=1: one top cell, one sub-centroid — everything lands in list 1
    val one = Ann.hierCentroids(four, "vec_id", "embedding", nLists = 1, trainRounds = 0)
    assert(one.sub.count() == 1L)
    val assigned = Ann.ivfAssignHier(four, "vec_id", "embedding", one)
    assert(assigned.count() == 4L)
    assert(assigned.select("list_id").distinct().as[Int].collect().toSeq == Seq(1))
    // searchTop larger than the number of top cells: slice pads nothing,
    // assignment still covers every vector exactly once
    val wide = Ann.ivfAssignHier(four, "vec_id", "embedding", one, searchTop = 5)
    assert(wide.count() == 4L)
    // full-probe search on the degenerate quantizer equals brute force
    val got = Ann.ivfTopKHier(four, four.filter(col("vec_id") === 1L),
        "vec_id", "embedding", k = 3, nLists = 1, nProbe = 1, trainRounds = 0)
      .select("cid").as[Long].collect().toSet
    assert(got == Set(2L, 3L, 4L))
  }

  test("text operators accept an empty corpus") {
    import graft.text.{CorpusStats, CorpusProfile, TfIdf}
    assert(CorpusStats.sourceDivergence(noDocs.withColumnRenamed("doc_id", "src"),
      col("src"), col("text")).count() == 0)
    assert(CorpusStats.docBigramCrossEntropy(noDocs, col("doc_id"), col("text")).count() == 0)
    assert(TfIdf.topTerms(noDocs, col("doc_id"), col("text"), k = 3).count() == 0)
    // the profile card still emits its single row, with zero counts
    val card = CorpusProfile.profile(noDocs.withColumn("source", lit("s")),
      col("text"), col("source")).head()
    assert(card.getAs[Long]("n_docs") == 0L && card.getAs[Long]("n_sources") == 0L)
  }

  test("packing and sampling accept an empty corpus") {
    import graft.operators.{Packing, Sampling}
    assert(Packing.packSequences(noDocs, col("doc_id"), col("text"), 50, 3).count() == 0)
    assert(Sampling.exactKPerStratum(noDocs.withColumn("s", lit("x")),
      key = col("doc_id"), stratum = col("s"), k = 5).count() == 0)
  }

  test("session additions accept an empty corpus") {
    import graft.text.{CorpusStats, HtmlExtract}
    import graft.similarity.Ann
    import graft.multimodal.ImageHash
    import graft.operators.AggState
    // zipfFit over nothing: one all-null-metrics row beats a throw
    val zf = CorpusStats.zipfFit(noDocs, col("text"), topK = 10).collect()
    assert(zf.length == 1 && zf(0).getLong(0) == 0L)
    assert(CorpusStats.qualityDrift(
      noDocs.withColumn("s", lit("x")), col("s"), lit(0.5), nBins = 4).count() == 0)
    assert(noDocs.select(HtmlExtract.extractText(col("text"))).count() == 0)
    val cents = Ann.ivfCentroids(
      Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding"), "vec_id", "embedding", 1)
    assert(Ann.outlierScores(noVecs, "vec_id", "embedding", cents).count() == 0)
    assert(Ann.degenerateVectors(noVecs, "vec_id", "embedding").count() == 0)
    val noHashes = Seq.empty[(Long, Long)].toDF("media_id", "h")
    assert(ImageHash.nearDupPairs(noHashes, "h", maxHamming = 3).count() == 0)
    val noKv = Seq.empty[(String, Double)].toDF("k", "x")
    val st = AggState.state(noKv, Seq("k"), Seq("x"))
    assert(st.count() == 0)
    assert(AggState.merge(Seq(st, st), Seq("k"), Seq("x")).count() == 0)
    assert(graft.sources.Warc.parseRecords(1L, Array.empty[Byte]).isEmpty)
  }

  test("change-management operators accept empty snapshots and batches") {
    import graft.etl.SnapshotDiff
    // both sides empty: a well-schemaed empty diff, not a throw
    val d = SnapshotDiff.diff(noDocs, noDocs, "doc_id", Seq("text"))
    assert(d.count() == 0 &&
      d.columns.toSet == Set("key", "prev_digest", "cur_digest", "change"))
    assert(SnapshotDiff.summarize(d).count() == 0)
    // canonical selection: empty corpus, and a corpus with no clusters
    import graft.dedup.Dedup
    val noClusters = Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
    assert(Dedup.canonicalByQuality(noDocs, col("doc_id"),
      length(col("text")), noClusters).count() == 0)
    val solo = Dedup.canonicalByQuality(
        Seq((7L, "x")).toDF("doc_id", "text"), col("doc_id"),
        length(col("text")), noClusters)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(solo.toSeq == Seq((7L, 7L, true)))
    // streaming content diff: an empty micro-batch writes empty state
    // and leaves the index readable
    val dir = java.nio.file.Files.createTempDirectory("graft-edge-contentdiff")
    graft.streaming.StreamOps.contentDiffBatch(
      noDocs, 0L, "doc_id", Seq("text"),
      dir.resolve("out").toString, dir.resolve("index").toString)
    assert(spark.read.parquet(dir.resolve("out").toString).count() == 0)
  }

  test("incremental semantic dedup accepts an empty batch AND an empty index") {
    import graft.similarity.Ann
    val cents = Ann.ivfCentroids(
      Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", 2)
    val emptyIndex = Ann.semanticIndex(noVecs, "vec_id", "embedding", cents)
    // empty batch vs empty index: no rows, no throw — the E10 bootstrap path
    assert(Ann.semanticDedupAgainst(noVecs, "vec_id", "embedding", cents, emptyIndex, 0.9)
      .count() == 0)
    // real batch vs empty index: everything novel survives
    val batch = Seq((5L, Array(1.0f, 0.0f)), (6L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val rep = Ann.semanticDedupAgainst(batch, "vec_id", "embedding", cents, emptyIndex, 0.9)
      .select("vid", "kept").as[(Long, Boolean)].collect().toMap
    assert(rep == Map(5L -> true, 6L -> true))
  }

  test("round-8 second-session additions accept an empty corpus") {
    import graft.analytics.Kpis
    import graft.dedup.Dedup
    import graft.operators.{Packing, Sampling}
    import graft.similarity.Ann
    import graft.text.C4Filter
    val c4 = C4Filter.clean(noDocs, col("text"))
    assert(c4.count() == 0 &&
      c4.columns.contains("c4") && c4.columns.contains("flags"))
    assert(Sampling.tokenBudgetPerStratum(noDocs.withColumn("s", lit("x")),
      col("s"), lit(1L), lit(1.0), col("doc_id"), budget = 10L).count() == 0)
    val noLabeled = Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label")
    assert(Ann.hardNegatives(noLabeled, noLabeled, "vec_id", "embedding", "label", 3).count() == 0)
    assert(Kpis.equiDepthHistogram(noDocs.withColumn("v", lit(1.0)),
      col("v"), buckets = 4, lo = 0.0, hi = 1.0).count() == 0)
    assert(Kpis.rollingActiveUsers(
      Seq.empty[(java.sql.Timestamp, Long)].toDF("ts", "user_id"),
      col("ts"), col("user_id")).count() == 0)
    assert(Dedup.removeContaminatedSpans(noDocs, noDocs,
      col("doc_id"), col("text"), col("text")).count() == 0)
    val sharded = Packing.assignBalancedShards(noDocs, col("doc_id"), lit(1L), shards = 3)
    assert(sharded.count() == 0 && sharded.columns.contains("shard"))
  }

  test("round-8 third-session additions accept an empty corpus") {
    import graft.analytics.{Anomaly, Attribution}
    import graft.dedup.Dedup
    import graft.graph.Triangles
    import graft.operators.Relational
    val noEvents = Seq.empty[(Long, java.sql.Timestamp, String, Long, Double)]
      .toDF("user", "ts", "etype", "event_id", "value")
    val tri = Triangles.triangleStats(Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst")
    val row = tri.head() // the one-row summary exists even on an empty graph
    assert(row.getAs[Long]("n_vertices") == 0 && row.getAs[Long]("n_triangles") == 0)
    assert(Dedup.containmentPairs(noDocs, col("doc_id"), col("text"), 0.8).count() == 0)
    val z = Anomaly.rollingZScore(noEvents, col("user"), col("ts"), col("value"), 3, 2.0)
    assert(z.count() == 0 && z.columns.contains("is_anomaly"))
    val at = Attribution.positionBased(noEvents, col("user"), col("ts"), col("etype"),
      col("event_id"), col("value"), Seq("view"), "purchase", 3600)
    assert(at.count() == 0 && at.columns.toSeq ==
      Seq("conv_id", "channel", "weight", "attributed"))
    assert(Attribution.channelSummary(at).count() == 0)
    val noDim = Seq.empty[(Long, String, java.sql.Timestamp, java.sql.Timestamp)]
      .toDF("user", "attr", "valid_from", "valid_to")
    val pit = Relational.pointInTimeJoin(
      noEvents.select(col("user"), col("ts")), noDim, "user", "ts", Seq("attr"))
    assert(pit.count() == 0 && pit.columns.contains("pit_attr"))
  }
}
