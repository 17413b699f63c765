package graft

import graft.analytics.Kpis
import graft.dedup.Dedup
import graft.etl.Checks
import graft.multimodal.Multimodal
import graft.operators.{Packing, Sampling}
import graft.text.TfIdf
import graft.similarity.Ann
import graft.text.{Redact, TextFunctions}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._


/** D-series driver queries (training-data operators: dedup, ANN, text
  * analysis, sampling, multimodal) with their DuckDB oracles — split
  * from SparkEntry, which documents the alias/ordering contract. */
private[graft] object DataQueries {

  /** Embeddings-corpus size memoized per sf dir. LSH auto-sizing needs
    * |corpus|, and a production caller passes it from their metastore
    * instead of paying a count job at every plan construction — here the
    * first of d6/d12 to run pays one metadata-cheap parquet count and
    * the rest reuse it. */
  private val corpusSizes = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def embeddingsCount(s: SparkSession, dir: String): Long =
    corpusSizes.computeIfAbsent(dir, _ => Tables.embeddings(s, dir).count())

  /** d32 model parameters: a deterministic pseudo-random weight vector
    * (any fixed model works — the operator under test is the hashed
    * inference, not the weights). Inlined as literals in BOTH the Spark
    * plan and the generated DuckDB oracle. */
  private val d32Dim = 64
  private val d32Weights: Seq[Double] =
    (0 until d32Dim).map(i => math.round(math.sin(i + 1.0) * 5000.0) / 10000.0)
  private val d32Bias = -0.1

  /** The d3 SimHash oracle recomputes the 60-bit md5-derived signatures
    * in SQL: 60 per-bit vote sums over unnested tokens, then bit
    * assembly and an O(n²) Hamming join (fine at oracle scale; the
    * Spark side uses the pigeonhole equi-join, which is complete, so
    * both formulations define the same pair set). */
  private val simHashVotesSql: String =
    (0 until 60).map(b => s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v$b").mkString(", ")
  private val simHashBitsSql: String =
    (0 until 60).map(b => s"(CASE WHEN v$b > 0 THEN (CAST(1 AS BIGINT) << $b) ELSE CAST(0 AS BIGINT) END)").mkString(" | ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ========================================== D: training-data operators

    "d1_dedup_exact" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.exactGroups(docs, col("doc_id"), col("text"))
        .orderBy("content_hash")
    }),

    // The production two-stage dedup pipeline: MinHash+LSH candidate
    // generation composed with exact-Jaccard verification on candidates
    // only. The oracle is the full exact-Jaccard pair set: at b=8/r=4 a
    // true pair (every ≥0.5-Jaccard pair in this corpus is ≥0.9) is
    // missed with prob < 2e-4, and the signature hashes are fixed, so
    // the composed result equals the exact set deterministically.
    "d2_dedup_minhash" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.jaccardVerify(
          Dedup.minHashCandidates(docs, col("doc_id"), col("text"),
            numHashes = 32, numBands = 8),
          docs, col("doc_id"), col("text"), threshold = 0.5)
        .orderBy("doc_a", "doc_b")
    }),

    // Pigeonhole candidates are COMPLETE (not probabilistic), so the
    // emitted set is exactly "all pairs with Hamming ≤ 3" — which the
    // oracle recomputes bit-for-bit from the md5-derived signatures.
    "d3_dedup_simhash" -> ((s, dir) => {
      Dedup.simHashPairs(Tables.documents(s, dir), col("doc_id"), col("text"),
          maxHamming = 3, chunks = 4)
        .orderBy("doc_a", "doc_b")
    }),

    "d4_ngram_jaccard" -> ((s, dir) => {
      Dedup.jaccardPairs(Tables.documents(s, dir), col("doc_id"), col("text"),
          threshold = 0.5, k = 3, maxDf = 100)
        .orderBy("doc_a", "doc_b")
    }),

    // Directional subset-duplicate detection: threshold 0.8 on
    // |A∩B|/min — catches pairs whose Jaccard sits far below d4's 0.5
    // bar because one side is much longer.
    "d62_containment" -> ((s, dir) => {
      Dedup.containmentPairs(Tables.documents(s, dir), col("doc_id"), col("text"),
          threshold = 0.8, k = 3, maxDf = 100)
        .orderBy("doc_a", "doc_b")
    }),

    "d5_ann_bruteforce" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Ann.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .orderBy("qid", "rank")
    }),

    // bits auto-sized from the corpus (bitsFor: 500/64 → 3 bits at
    // sf0.01); tables=48 puts per-pair recall above 1-3e-5 even at the
    // lowest top-5 cosine in this corpus (~0.26 ⇒ p=0.582,
    // recallFor(0.26, 3, 48) ≈ 0.99997), so the deterministic-plane LSH
    // result equals exact brute-force top-k — the oracle below.
    "d6_ann_lsh" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Ann.lshTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          dims = 64, k = 5, tables = 48, corpusSize = Some(embeddingsCount(s, dir)))
        .orderBy("qid", "rank")
    }),

    "d7_text_quality" -> ((s, dir) => {
      val t = col("text")
      val enStop = TextFunctions.LangStopwords.head._2
      Tables.documents(s, dir).select(
          col("doc_id"),
          length(t).cast("long").as("n_chars"),
          TextFunctions.tokenCount(t).as("n_words"),
          round(length(t).cast("double") / TextFunctions.tokenCount(t), 4).as("avg_word_len"),
          round(TextFunctions.punctRatio(t), 4).as("punct_ratio"),
          round(TextFunctions.upperRatio(t), 4).as("upper_ratio"),
          round(TextFunctions.stopwordRatio(t, enStop), 4).as("stopword_ratio"),
          round(TextFunctions.qualityScore(t), 4).as("quality"))
        .orderBy("doc_id")
    }),

    // Confusion cells (pred_lang × labeled lang) so the oracle
    // discriminates across multiple rows. Tokens are staged once, hit
    // counts staged next, argmax last — each projection materializes
    // what the next one's higher-order functions reference (interpreted
    // HOFs get no subexpression elimination; see TextFunctions).
    "d8_lang_id" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("lang"), TextFunctions.tokens(col("text")).as("__toks"))
      val hits = toks.select(
        col("lang") +: TextFunctions.langHitsOf(col("__toks")).map { case (l, c) => c.as(s"__h_$l") }: _*)
      hits.select(col("lang"),
          TextFunctions.langPred(TextFunctions.LangStopwords.map { case (l, _) => l -> col(s"__h_$l") }).as("pred_lang"))
        .groupBy("pred_lang", "lang")
        .agg(count(lit(1)).as("n"))
        .orderBy("pred_lang", "lang")
    }),

    "d9_token_count" -> ((s, dir) => {
      Tables.documents(s, dir)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text"))).as("ws_tokens"),
          sum(TextFunctions.regexTokenCount(col("text"))).as("re_tokens"),
          round(avg(TextFunctions.tokenCount(col("text"))), 4).as("avg_ws_tokens"))
        .orderBy("source")
    }),

    // Tokens staged in their own projection so the interpreted shingle
    // HOF references a materialized array (see TextFunctions.shinglesOf).
    "d10_fingerprint" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          TextFunctions.contentFingerprint(col("text")).as("content_md5"),
          TextFunctions.tokens(col("text")).as("__toks"))
        .select(col("doc_id"), col("content_md5"),
          TextFunctions.minShingleFingerprintOf(col("__toks")).as("min_shingle_md5"))
        .orderBy("doc_id")
    }),

    "d11_vector_stats" -> ((s, dir) => {
      import graft.vectors.VectorOps
      val v = VectorOps.toDouble(col("embedding"))
      Tables.embeddings(s, dir)
        .select(col("label").cast("long").as("label"),
          VectorOps.l2Norm(v).as("norm"), element_at(v, 1).as("d1"), element_at(v, 2).as("d2"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"), round(avg("norm"), 4).as("avg_norm"),
          round(avg("d1"), 4).as("avg_dim1"), round(avg("d2"), 4).as("avg_dim2"))
        .orderBy("label")
    }),

    // Int8 embedding quantization (D29): per-label reconstruction-error
    // stats, every arithmetic step (scale, clamp, half-up round, error)
    // mirrored in the oracle. Staged projections per the HOF rule.
    "d29_quantize" -> ((s, dir) => {
      import graft.vectors.{Quantize, VectorOps}
      Tables.embeddings(s, dir)
        .select(col("label").cast("long").as("label"),
          VectorOps.toDouble(col("embedding")).as("__v"))
        .withColumn("__scale", Quantize.int8Scale(col("__v")))
        .withColumn("__q", Quantize.int8Quantize(col("__v"), col("__scale")))
        .select(col("label"), col("__scale"),
          Quantize.int8MaxError(col("__v"), col("__q"), col("__scale")).as("__err"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          round(avg("__scale"), 4).as("avg_scale"),
          round(avg("__err"), 4).as("avg_max_err"),
          round(max("__err"), 4).as("worst_err"))
        .orderBy("label")
    }),

    // τ=0.45 sits in a gap of this corpus's cosine distribution; bits
    // auto-size to 3 at sf0.01 and tables=24 gives per-pair recall
    // ≥ 1-5e-4 at the threshold (recallFor(0.4516, 3, 24) ≈ 0.9995), so
    // the LSH-restricted pair set equals the exact ≥τ set — the oracle.
    "d12_embed_neardup" -> ((s, dir) => {
      Ann.embeddingNearDupPairs(Tables.embeddings(s, dir), "vec_id", "embedding",
          dims = 64, threshold = 0.45, tables = 24,
          corpusSize = Some(embeddingsCount(s, dir)))
        .orderBy("doc_a", "doc_b")
    }),

    "d13_multimodal" -> ((s, dir) => {
      val media = Multimodal.asMedia(Tables.documents(s, dir), "doc_id", "text", "text/plain", "source")
      Multimodal.withBinaryMetrics(media)
        .groupBy("source", "media_type")
        .agg(count(lit(1)).as("n"),
          sum("byte_len").as("sum_bytes"),
          countDistinct(col("sha256")).as("n_checksums"))
        .orderBy("source")
    }),

    // Deterministic stratified sampling: md5-keyed buckets, so the
    // selection is reproducible on any cluster layout and the oracle
    // re-derives it exactly (df.sample's RNG cannot be verified).
    "d14_sample" -> ((s, dir) => {
      Sampling.stratifiedHashSample(Tables.documents(s, dir),
          key = col("doc_id"), stratum = col("lang"),
          fractions = Map("en" -> 0.25, "de" -> 1.0), default = 0.1)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), sum(length(col("text")).cast("long")).as("sum_chars"))
        .orderBy("lang")
    }),

    // Exactly-k-per-stratum deterministic sampling (D30): fixed-SIZE
    // eval sets per language (fractional sampling can't promise a
    // size). The oracle re-derives the md5 rank order and the exact
    // selection — sum_ids pins the member set, not just the count.
    "d30_sample_k" -> ((s, dir) => {
      Sampling.exactKPerStratum(Tables.documents(s, dir),
          key = col("doc_id"), stratum = col("lang"), k = 7)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), sum("doc_id").as("sum_ids"))
        .orderBy("lang")
    }),

    // Pairwise near-dups resolved to clusters (connected components):
    // the keep/drop decision layer above d2. The oracle computes the
    // same min-reachable-id labels with a recursive CTE.
    "d15_dedup_clusters" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.jaccardVerify(
        Dedup.minHashCandidates(docs, col("doc_id"), col("text"), 32, 8),
        docs, col("doc_id"), col("text"), threshold = 0.5)
      Dedup.clusterPairs(pairs).orderBy("doc_id")
    }),

    // Quality-aware canonicalization of the d15 clusters: keep each
    // cluster's longest member (token count as the quality score — the
    // keep-longest curation rule), ties to the smallest id; singletons
    // keep themselves.
    "d15b_canonical_keep" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.jaccardVerify(
        Dedup.minHashCandidates(docs, col("doc_id"), col("text"), 32, 8),
        docs, col("doc_id"), col("text"), threshold = 0.5)
      Dedup.canonicalByQuality(docs, col("doc_id"),
          graft.text.TextFunctions.tokenCount(col("text")), Dedup.clusterPairs(pairs))
        .orderBy("doc_id")
    }),

    "d16_tfidf" -> ((s, dir) => {
      TfIdf.topTerms(Tables.documents(s, dir), col("doc_id"), col("text"), k = 3)
        .orderBy("doc_id", "term")
    }),

    "d17_packing" -> ((s, dir) => {
      Packing.packStats(Packing.packSequences(Tables.documents(s, dir),
          col("doc_id"), col("text"), budget = 512, nShards = 8))
        .orderBy("shard", "pack_id")
    }),

    // Training-ready pack manifest: ordered member docs + cu_seqlens
    // boundaries per pack, csv-ized so the oracle hash-checks the full
    // slicing contract (not just counts).
    "d17b_pack_manifest" -> ((s, dir) => {
      Packing.packManifest(Packing.packSequences(Tables.documents(s, dir),
          col("doc_id"), col("text"), budget = 512, nShards = 8))
        .select(col("shard"), col("pack_id"), col("n_docs"), col("sum_tokens"),
          array_join(transform(col("doc_ids"), _.cast("string")), ",").as("doc_ids_csv"),
          array_join(transform(col("cu_seqlens"), _.cast("string")), ",").as("cu_csv"))
        .orderBy("shard", "pack_id")
    }),

    // PII redaction over deterministically constructed PII-bearing text
    // (the synthetic corpus carries none, so the query plants one email/
    // URL/phone/IP per document from its id — the oracle mirrors the
    // construction and each regex pass exactly).
    "d20_redact" -> ((s, dir) => {
      val id = col("doc_id")
      val t2 = concat(col("text"),
        lit(" contact user"), id.cast("string"),
        lit("@example.com or https://site"), (id % 7).cast("string"),
        lit(".org/p call 555-12"), (id % 10).cast("string"),
        lit("-4567 from 10.0."), (id % 256).cast("string"), lit(".1"))
      Tables.documents(s, dir)
        .select(col("source"), t2.as("t2"))
        .select(col("source"),
          Redact.piiCount(col("t2"), Redact.EmailPattern).as("n_email"),
          Redact.piiCount(col("t2"), Redact.UrlPattern).as("n_url"),
          Redact.piiCount(col("t2"), Redact.PhonePattern).as("n_phone"),
          (length(Redact.redactPii(col("t2"))) - length(col("t2"))).cast("long").as("len_delta"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_email").as("n_emails"), sum("n_url").as("n_urls"),
          sum("n_phone").as("n_phones"), sum("len_delta").as("sum_len_delta"))
        .orderBy("source")
    }),

    // Repetition/boilerplate signal: 1 − distinct/total tokens per doc.
    "d22_repetition" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("__toks"))
        .select(col("doc_id"),
          size(col("__toks")).cast("long").as("n_tokens"),
          size(array_distinct(col("__toks"))).cast("long").as("n_distinct"),
          round(TextFunctions.repetitionRatioOf(col("__toks")), 4).as("repetition"))
        .orderBy("doc_id")
    }),

    // One-pass corpus card: volume, source/language mix, exact-dup
    // volume, stutter noise, mean quality — every metric an aggregate
    // over ONE documents scan (CorpusProfileSpec pins the scan count).
    // All metrics exact, so the whole card hash-checks against DuckDB.
    "d40_corpus_profile" -> ((s, dir) => {
      graft.text.CorpusProfile.profile(Tables.documents(s, dir),
        col("text"), col("source"))
    }),

    // Token-stutter collapse: runs of identical consecutive tokens
    // reduced to one occurrence — the token-granularity form of C4's
    // repeated-line cleanup (same collapseRuns works on line arrays).
    // Narrow map, zero shuffle; the cleaned text is content-verified
    // via an md5 prefix like d24/d31.
    "d39_stutter_collapse" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("__toks"))
        .select(col("doc_id"), col("__toks"),
          TextFunctions.collapseRuns(col("__toks")).as("__kept"))
        .select(col("doc_id"),
          size(col("__toks")).cast("long").as("n_tokens"),
          size(col("__kept")).cast("long").as("n_kept"),
          substring(md5(array_join(col("__kept"), " ")), 1, 8).as("clean_md5"))
        .orderBy("doc_id")
    }),

    // Dataset-mixing signal: KL divergence of each source's unigram
    // distribution from the corpus blend, in bits.
    "d26_source_divergence" -> ((s, dir) => {
      graft.text.CorpusStats.sourceDivergence(Tables.documents(s, dir),
          col("source"), col("text"))
        .orderBy("source")
    }),

    // Context-window chunking: 32-token chunks, 8-token overlap; the
    // chunk text is verified via an md5 prefix so the oracle checks
    // CONTENT, not just counts.
    "d24_chunking" -> ((s, dir) => {
      graft.text.Chunking.chunkDocuments(Tables.documents(s, dir),
          col("doc_id"), col("text"), chunkTokens = 32, overlapTokens = 8)
        .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
          substring(md5(col("chunk_text")), 1, 8).as("chunk_md5"))
        .orderBy("doc_id", "chunk_id")
    }),

    // Decontamination: documents with doc_id % 50 == 0 stand in for the
    // eval set; every other document reports its 3-gram overlap with
    // that set's shingle universe.
    "d25_decontaminate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.contaminationReport(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0),
          col("doc_id"), col("text"))
        .orderBy("doc_id")
    }),

    // IVF-Flat ANN at real approximate params (probe 4 of 8 lists —
    // observed recall ≈ 0.72 vs exact top-5 on this corpus, measured in
    // AnnSpec). The oracle does NOT fall back to exact search: centroid
    // selection is md5-keyed and assignment/probe/top-k are plain
    // argmax-cosine relational steps, so DuckDB mirrors the ENTIRE IVF
    // pipeline bit-for-bit (same double upcast, same dot/norm formula,
    // same tie-breaks) — the approximate result itself is hash-checked.
    "d23_ann_ivf" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Ann.ivfTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 5, nLists = 8, nProbe = 4)
        .orderBy("qid", "rank")
    }),

    // Hierarchical (two-level) IVF at the same probe discipline: 3
    // md5-keyed top cells, ≤3 sub-centroids per cell (the per-cell
    // hash-threshold oversample + rank), corpus assigned through the
    // top-2 cells, queries probe 4 of the 9 lists. trainRounds=0 HERE
    // (and only here): Lloyd means average floats in partition order,
    // which is run-nondeterministic — raw-vector centroids keep every
    // double bit-identical so the oracle mirrors the WHOLE two-level
    // pipeline and the approximate result itself is hash-checked.
    "d23b_ann_ivf_hier" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Ann.ivfTopKHier(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 5, nLists = 9, nProbe = 4, trainRounds = 0)
        .orderBy("qid", "rank")
    }),

    // SemDeDup-style semantic dedup: the corpus sharded into d23's 8
    // md5-keyed IVF clusters, cosine compared ONLY within a cluster
    // (the paper's own cost bound), lower-id member of every ≥τ pair
    // survives. τ=0.45 = d12's corpus-gap threshold. The oracle mirrors
    // centroid sample, assignment, in-cluster pairing and the keep rule,
    // so the approximate (cluster-blocked) result itself is hash-checked.
    "d38_semantic_dedup" -> ((s, dir) => {
      Ann.semanticDedup(Tables.embeddings(s, dir), "vec_id", "embedding",
          threshold = 0.45, nLists = 8)
        .select(col("vid").as("vec_id"), col("list_id"), col("kept"))
        .orderBy("vec_id")
    }),

    // Per-group quantile quality filter: keep the top 25% of documents
    // per source by the composite quality score — per-group cutoffs
    // adapt to each source's score distribution.
    "d19_quality_filter" -> ((s, dir) => {
      val q = TextFunctions.qualityScore(col("text"))
      Kpis.topFractionPerGroup(Tables.documents(s, dir),
          group = col("source"), score = q, fraction = 0.25, tieBreak = Seq(col("doc_id")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), round(avg(q), 4).as("avg_quality"))
        .orderBy("source")
    }),

    // Dataset-mixing rebalance: largest deterministic subsample whose
    // language shares hit the 4:3:2:1 target (zh unweighted → dropped;
    // the binding stratum keeps every row). The oracle re-derives the
    // per-stratum cutoffs AND the md5 bucket selection.
    "d27_rebalance_mix" -> ((s, dir) => {
      Sampling.rebalanceToMix(Tables.documents(s, dir),
          key = col("doc_id"), stratum = col("lang"),
          weights = Map("en" -> 0.4, "de" -> 0.3, "es" -> 0.2, "fr" -> 0.1))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), sum(length(col("text")).cast("long")).as("sum_chars"))
        .orderBy("lang")
    }),

    // Temperature-flattened mix at α = 0.5: per-language targets come
    // from the observed counts (p ∝ n^0.5), smallest language keeps
    // every row, heads downsample — the oracle re-derives the pow/min
    // cutoffs and the md5 bucket selection.
    "d55_temperature_mix" -> ((s, dir) => {
      Sampling.temperatureMix(Tables.documents(s, dir),
          key = col("doc_id"), stratum = col("lang"), alpha = 0.5)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), sum(length(col("text")).cast("long")).as("sum_chars"))
        .orderBy("lang")
    }),

    // Soft dedup: 1/|cluster| sampling weights over the d15 component
    // pipeline, singletons at weight 1 — the oracle re-derives the
    // clusters recursively and the weights from their sizes.
    "d61_soft_dedup" -> ((s, dir) => {
      Dedup.duplicationWeights(Tables.documents(s, dir),
          col("doc_id"), col("text"), threshold = 0.5)
        .orderBy("doc_id")
    }),

    // Balanced output sharding: 8 shards, the 32 costliest docs striped
    // serpentine by rank, the tail hash-assigned; the oracle replays
    // rank, fold, and md5 assignment and checks per-shard totals.
    "d60_balanced_shards" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Packing.assignBalancedShards(docs, col("doc_id"),
          TextFunctions.tokenCount(col("text")), shards = 8, headSize = 32)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text"))).as("sum_tokens"))
        .orderBy("shard")
    }),

    // Contamination-span removal: every train-doc token covered by a
    // 4-gram the eval slice (doc_id % 50 = 0, d25's split) contains is
    // masked; content verified via an md5 prefix like d31.
    "d59_decontam_spans" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.removeContaminatedSpans(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0),
          col("doc_id"), col("text"), col("text"), w = 4)
        .select(col("doc_id"),
          substring(md5(col("clean_text")), 1, 8).as("clean_md5"),
          col("n_tokens"), col("n_kept"))
        .orderBy("doc_id")
    }),

    // Hard-negative mining: per anchor, the 5 most-cosine-similar
    // vectors with a DIFFERENT label — exact miner (the IVF-probed
    // variant is recall-tested in AnnSpec). Oracle = d5's brute-force
    // ranking plus the label-difference predicate.
    "d58_hard_negatives" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Ann.hardNegatives(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", group = "label", k = 5)
        .orderBy("qid", "rank")
    }),

    // Token-budget quota per source: best-first by the n_chars quality
    // proxy (callers pass a real quality score), kept while the running
    // token count stays within 600 tokens per source. The oracle
    // replays the same per-stratum running-sum window.
    "d57_token_budget" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Sampling.tokenBudgetPerStratum(docs,
          stratum = col("source"), cost = TextFunctions.tokenCount(col("text")),
          quality = col("n_chars"), tieBreak = col("doc_id"), budget = 600L)
        .select(col("doc_id"), col("source"),
          TextFunctions.tokenCount(col("text")).as("n_toks"), col("cum_cost"))
        .orderBy("source", "cum_cost", "doc_id")
    }),

    // C4-style cleaning (Raffel et al. 2020 §2.2) over a corpus given
    // deterministic line structure in the query itself (the documents
    // table is single-line): sentence-like lines survive, then page
    // gates (≥3 sentences, lorem ipsum, '{', bad words) run on the
    // cleaned text. The oracle recomputes every rule bit-for-bit,
    // including the clean-text md5.
    "d56_c4_filter" -> ((s, dir) => {
      val t = split(col("text"), " ")
      def seg(start: Int, len: Int) = array_join(slice(t, start, len), " ")
      val synth = Tables.documents(s, dir).select(col("doc_id"),
        concat_ws("\n",
          concat(seg(1, 6), lit(".")),
          seg(7, 3),
          concat(seg(10, 6), lit("?")),
          lit("about javascript and more things here."),
          when(col("doc_id") % 2 === 0,
            lit("an extra sentence rounds out even documents.")).otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            lit("config { x } traced through seven docs.")).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            lit("lorem ipsum dolor sit amet consectetur.")).otherwise(lit("")),
          when(col("doc_id") % 13 === 0,
            lit("this document regrettably contains badword today.")).otherwise(lit("")))
          .as("text"))
      graft.text.C4Filter.clean(synth, col("text"), badWords = Seq("badword"))
        .select(col("doc_id"),
          col("c4.n_lines").as("n_lines"), col("c4.n_kept").as("n_kept"),
          md5(col("c4.clean_text")).as("clean_md5"),
          col("flags.ok_sentences").as("ok_sentences"),
          col("flags.ok_lorem").as("ok_lorem"),
          col("flags.ok_brace").as("ok_brace"),
          col("flags.ok_bad_words").as("ok_bad_words"),
          col("flags.keep").as("keep"))
        .orderBy("doc_id")
    }),

    // Sub-document duplication: share of 4-token windows that also
    // occur in another document, aggregated per source.
    "d28_dup_spans" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.duplicatedSpanStats(docs, col("doc_id"), col("text"), w = 4)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_windows").as("n_windows"),
          sum("n_dup_windows").as("n_dup"),
          round(sum("n_dup_windows").cast("double") / sum("n_windows"), 4).as("dup_ratio"))
        .orderBy("source")
    }),

    // Duplicated-span REMOVAL — the rewrite half of d28: every token
    // covered by a cross-document 4-token window is dropped, and the
    // cleaned text itself is verified via an md5 prefix (content, not
    // just counts).
    "d31_span_removal" -> ((s, dir) => {
      Dedup.removeDuplicatedSpans(Tables.documents(s, dir),
          col("doc_id"), col("text"), w = 4)
        .select(col("doc_id"),
          substring(md5(col("clean_text")), 1, 8).as("clean_md5"),
          col("n_tokens"), col("n_kept"))
        .orderBy("doc_id")
    }),

    // Canonical-owner variant of d31: the min-id document owning each
    // cross-document gram KEEPS its spans; only non-owners drop tokens —
    // one copy of shared boilerplate survives the corpus.
    "d31b_span_keepfirst" -> ((s, dir) => {
      Dedup.removeDuplicatedSpansKeepFirst(Tables.documents(s, dir),
          col("doc_id"), col("text"), w = 4)
        .select(col("doc_id"),
          substring(md5(col("clean_text")), 1, 8).as("clean_md5"),
          col("n_tokens"), col("n_kept"))
        .orderBy("doc_id")
    }),

    // Exact-substring dedup (Lee et al. 2021) at 5-token granularity:
    // any ≥5-token substring occurring more than once in the corpus
    // (within-doc repeats count) is removed everywhere except its
    // globally-first occurrence; content verified via an md5 prefix.
    "d91_substring_dedup" -> ((s, dir) => {
      Dedup.exactSubstringDedup(Tables.documents(s, dir),
          col("doc_id"), col("text"), k = 5)
        .select(col("doc_id"),
          substring(md5(col("clean_text")), 1, 8).as("clean_md5"),
          col("n_tokens"), col("n_kept"))
        .orderBy("doc_id")
    }),

    // BPE training step 1 at corpus scale: word-frequency vocabulary
    // (the only corpus-wide pass), then frequency-weighted adjacent
    // char-pair counts over the DISTINCT vocabulary.
    "d34_bpe_pairs" -> ((s, dir) =>
      graft.text.Bpe.topPairs(Tables.documents(s, dir), col("text"), 20)),

    // Gopher-rule hard quality gates (arXiv 2112.11446 Table A1): one
    // narrow-map struct of per-rule booleans, aggregated per source —
    // pass/fail counts for every rule are hash-checked.
    "d41_gopher_filter" -> ((s, dir) => {
      val f = graft.text.GopherFilter.flags(col("text"))
      Tables.documents(s, dir)
        .select(col("source"), f.as("f"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("f.keep"), 1L).otherwise(0L)).as("n_keep"),
          sum(when(!col("f.ok_word_count"), 1L).otherwise(0L)).as("n_fail_words"),
          sum(when(!col("f.ok_mean_word_len"), 1L).otherwise(0L)).as("n_fail_mean_len"),
          sum(when(!col("f.ok_symbol_ratio"), 1L).otherwise(0L)).as("n_fail_symbols"),
          sum(when(!col("f.ok_alpha_words"), 1L).otherwise(0L)).as("n_fail_alpha"),
          sum(when(!col("f.ok_stop_words"), 1L).otherwise(0L)).as("n_fail_stop"))
        .orderBy("source")
    }),

    // Gopher repetition gates (Table A1 bottom half): duplicate
    // line/paragraph fractions, top n-gram and duplicated n-gram char
    // fractions — all per-row narrow maps (grams never leave their
    // row). Per-rule fail counts plus two rounded metric means are
    // hash-checked per source.
    "d42_gopher_repetition" -> ((s, dir) => {
      graft.text.GopherRepetition.addFlags(Tables.documents(s, dir), col("text"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("rep.keep"), 1L).otherwise(0L)).as("n_keep"),
          sum(when(!col("rep.ok_dup_lines"), 1L).otherwise(0L)).as("n_fail_dup_lines"),
          sum(when(!col("rep.ok_dup_line_chars"), 1L).otherwise(0L)).as("n_fail_dup_line_chars"),
          sum(when(!col("rep.ok_dup_paras"), 1L).otherwise(0L)).as("n_fail_dup_paras"),
          sum(when(!col("rep.ok_dup_para_chars"), 1L).otherwise(0L)).as("n_fail_dup_para_chars"),
          sum(when(!col("rep.ok_top_ngrams"), 1L).otherwise(0L)).as("n_fail_top_ngrams"),
          sum(when(!col("rep.ok_dup_ngrams"), 1L).otherwise(0L)).as("n_fail_dup_ngrams"),
          round(avg(col("rep.top_2gram_char_frac")), 4).as("avg_top_2gram"),
          round(avg(col("rep.dup_line_char_frac")), 4).as("avg_dup_line_chars"))
        .orderBy("source")
    }),

    // Cross-document paragraph dedup with reassembly: keep-first on the
    // normalized-paragraph fingerprint, survivors rejoin in order. The
    // reassembled text is verified via md5.
    "d43_paragraph_dedup" -> ((s, dir) =>
      graft.dedup.Dedup.paragraphDedup(Tables.documents(s, dir), col("doc_id"), col("text"))
        .select(col("doc_id"), col("n_paras"), col("n_kept"),
          md5(col("clean_text")).as("clean_md5"))
        .orderBy("doc_id")),

    // DSIR importance resampling toward a target domain (src0+src1):
    // hashed unigram+bigram log-ratio weights ride as a literal array
    // (bounded collect, d32 discipline), scoring is a zero-shuffle
    // narrow fold, selection is deterministic Gumbel top-50.
    "d44_dsir_resample" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val lam = graft.text.Dsir.lambdaWeightsWithin(
        docs, col("source").isin("src0", "src1"), col("text"), 512)
      val scored = graft.text.Dsir.scoreDocuments(docs, col("doc_id"), col("text"), lam)
      graft.text.Dsir.gumbelTopK(scored, col("doc_id"), col("log_weight"), 50)
        .select(col("doc_id"), round(col("log_weight"), 4).as("log_weight"))
        .orderBy("doc_id")
    }),

    // The composed pretraining pipeline: Gopher gates → exact
    // keep-first dedup → paragraph dedup, reported as a per-source
    // funnel of exact integers.
    "d45_pretrain_pipeline" -> ((s, dir) =>
      graft.etl.PretrainPipeline.summary(
        Tables.documents(s, dir), col("doc_id"), col("text"), col("source"))),

    // Flesch readability metrics: counts plus both indices per doc,
    // arithmetic in one fixed association order so the oracle's
    // doubles match bit-for-bit before rounding.
    "d46_readability" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), graft.text.Readability.metrics(col("text")).as("m"))
        .select(col("doc_id"), col("m.n_sentences"), col("m.n_words"),
          col("m.n_syllables"), col("m.reading_ease"), col("m.fk_grade"))
        .orderBy("doc_id")),

    // jusText-style boilerplate line removal: per-doc kept-line counts
    // plus the md5 of the reassembled text verify the rule and the
    // reassembly exactly.
    "d47_boilerplate_lines" -> ((s, dir) =>
      graft.text.Boilerplate.addCleanLines(Tables.documents(s, dir), col("text"))
        .select(col("doc_id"), col("bl.n_lines").as("n_lines"),
          col("bl.n_kept").as("n_kept"), md5(col("bl.clean_text")).as("clean_md5"))
        .orderBy("doc_id")),

    // Language segmentation over a deterministically code-switched
    // corpus (each doc sandwiches a German line), one row per
    // contiguous same-language line run.
    "d48_lang_segments" -> ((s, dir) => {
      val switched = Tables.documents(s, dir).select(col("doc_id"),
        concat(col("text"), lit("\nder und das ist ein test nicht zu\n"), col("text"))
          .as("text"))
      graft.text.LangSegments.segments(switched, col("doc_id"), col("text"))
        .orderBy("doc_id", "seg_no")
    }),

    // Common-vocabulary coverage: per-doc fraction of token
    // occurrences in the corpus top-15 terms (the synthetic corpus
    // has ~31 distinct tokens, so the boundary binds and coverage
    // varies); vocabulary boundary ties break by term.
    "d49_vocab_coverage" -> ((s, dir) =>
      graft.text.CorpusStats.vocabCoverage(
        Tables.documents(s, dir), col("doc_id"), col("text"), 15)
        .orderBy("doc_id")),

    // Corpus-health power-law fit: least-squares of ln(freq) on
    // ln(rank) over the top-k terms, from plain sums so the oracle's
    // arithmetic is identical; head_share = token share of the head.
    "d50_zipf_fit" -> ((s, dir) =>
      graft.text.CorpusStats.zipfFit(Tables.documents(s, dir), col("text"), topK = 100)),

    // Heaps-law vocabulary growth: V(N) = K·N^beta over doc arrival
    // order — first-seen min(order) reduce, one runningSums pass for
    // both cumulatives, d50's plain-sums regression closed form.
    "d84_heaps_fit" -> ((s, dir) =>
      graft.text.CorpusStats.heapsFit(
        Tables.documents(s, dir).filter(col("text").isNotNull),
        col("doc_id"), col("text"))),

    // TextRank corpus keywords: weighted PageRank over the symmetric
    // adjacent-word graph (minCount 5 noise floor, 5 rounds) — graph
    // centrality finds the topic-bearing vocabulary.
    "d90_textrank" -> ((s, dir) => {
      graft.text.TextRank.textRank(
          Tables.documents(s, dir).filter(col("text").isNotNull),
          col("text"), damping = 0.85, iters = 5, minCount = 5)
        .select(col("token"), round(col("rank"), 6).as("rank"))
        .orderBy("token")
    }),

    // Isotonic calibration of a normalized length score against the
    // lang='en' rate — PAV via the minimax closed form over 16 bins,
    // every window bin-scale bounded.
    "d89_isotonic" -> ((s, dir) => {
      graft.analytics.Calibration.isotonicCalibration(
          Tables.documents(s, dir).filter(col("text").isNotNull),
          col("n_chars") / lit(600.0), (col("lang") === "en").cast("int"),
          nBins = 16)
        .select(col("bin"), col("n"), round(col("raw_rate"), 6).as("raw_rate"),
          round(col("calibrated"), 6).as("calibrated"))
        .orderBy("bin")
    }),

    // Church-Gale burstiness: variance-to-mean ratio of per-doc term
    // counts (zeros via the ΣC²/N closed form — never materialized);
    // the list-free stopword/content-word separator.
    "d88_burstiness" -> ((s, dir) => {
      graft.text.CorpusStats.burstiness(
          Tables.documents(s, dir).filter(col("text").isNotNull),
          col("doc_id"), col("text"), minTotal = 10L)
        .select(col("token"), col("df"), col("total"),
          round(col("vmr"), 6).as("vmr"))
        .orderBy("token")
    }),

    // Fightin'-Words log-odds vocabulary shift: which terms distinguish
    // the src0/src1 slice from the rest — one conditional (token × side)
    // aggregate, Dirichlet prior from the pooled corpus, z-scaled.
    "d87_log_odds" -> ((s, dir) => {
      graft.text.CorpusStats.logOddsShift(
          Tables.documents(s, dir).filter(col("text").isNotNull),
          col("text"), col("source").isin("src0", "src1"), alpha0 = 200.0)
        .select(col("token"), col("y_a"), col("y_b"),
          round(col("delta"), 6).as("delta"), round(col("z"), 6).as("z"))
        .orderBy("token")
    }),

    // Adjacent-bigram PMI collocations over the corpus: bigram counts
    // partial-aggregate, margins derive from the bigram-type table,
    // product-free logs — which pairs co-occur above chance.
    "d86_collocations" -> ((s, dir) => {
      graft.text.Collocations.pmiCollocations(
          Tables.documents(s, dir).filter(col("text").isNotNull),
          col("text"), minCount = 5L)
        .select(col("w1"), col("w2"), col("cnt"), round(col("pmi"), 6).as("pmi"))
        .orderBy("w1", "w2")
    }),

    // Near-identical identifiers (one-keystroke variants) among customer
    // names: deletion-neighborhood equi-join (FastSS) generates
    // candidates, exact levenshtein verifies — never all-pairs over |V|².
    "d85_spell_variants" -> ((s, dir) => {
      val vocab = Tables.customer(s, dir)
        .select(lower(trim(col("c_name"))).as("term"))
      graft.dedup.EditDistance.spellVariantPairs(vocab, col("term"),
          minLen = 4, keyDfCap = 100)
        .orderBy("a", "b")
    }),

    // Embedding outlier QA: per-vector cosine to its assigned coarse
    // centroid, z-scored within the cluster (mirror-exact moments from
    // plain sums). The gate ahead of the ANN/SemDeDup consumers.
    "d53_embed_outliers" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cents = Ann.ivfCentroids(emb, "vec_id", "embedding", 8)
      Ann.outlierScores(emb, "vec_id", "embedding", cents).orderBy("vec_id")
    }),

    // BM25 top-k retrieval: fixed literal queries against the documents
    // corpus — postings + df are corpus-side aggregates, the query set
    // broadcasts, and only the final top-k window partitions per query.
    "d54_bm25_retrieval" -> ((s, dir) => {
      import s.implicits._
      val qs = Seq((1L, "spark sort merge"), (2L, "stream window value"),
        (3L, "filter scan column")).toDF("query_id", "query_text")
      graft.text.Bm25.retrieve(Tables.documents(s, dir),
          col("doc_id"), col("text"), qs, k = 5)
        .orderBy("query_id", "rank")
    }),

    // Per-source quality-distribution drift vs the corpus: PSI +
    // chi-square over fixed equal-width bins of the d7 quality score.
    "d52_quality_drift" -> ((s, dir) =>
      graft.text.CorpusStats.qualityDrift(Tables.documents(s, dir),
          col("source"), graft.text.TextFunctions.qualityScore(col("text")), nBins = 10)
        .orderBy("slice")),

    // Perceptual-hash near-dup pairing (the banding half of D51; the
    // decode/hash half is spec-covered on real JDK rasters). Hashes
    // synthesized with planted near-duplicates: md5 bucket base XOR a
    // 1-bit perturbation — same-bucket pairs sit at Hamming 0/2,
    // cross-bucket pairs are ~30 bits apart. Spark runs the pigeonhole
    // band join; the oracle brute-forces all pairs, so a hash match
    // PROVES band completeness at maxHamming=2.
    "d51_phash_neardup" -> ((s, dir) => {
      val h = conv(substring(md5(pmod(col("doc_id"), lit(37)).cast("string")), 1, 15), 16, 10)
        .cast("long")
        .bitwiseXOR(expr("CAST(pow(2, doc_id % 11) AS BIGINT)"))
      val hashes = Tables.documents(s, dir).select(col("doc_id").as("media_id"), h.as("h"))
      graft.multimodal.ImageHash.nearDupPairs(hashes, "h", maxHamming = 2)
        .groupBy("hamming")
        .agg(count(lit(1)).as("n_pairs"), sum("id_a").as("sum_a"), sum("id_b").as("sum_b"))
        .orderBy("hamming")
    }),

    // BPE ENCODING under a fixed ordered merge list: the expensive
    // merge loop runs per DISTINCT word (vocabulary-sized), then joins
    // back to the corpus positions. Unit content is verified via an
    // md5 prefix over the space-joined subword units.
    "d34b_bpe_encode" -> ((s, dir) => {
      val merges = Seq(("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"))
      graft.text.Bpe.encode(Tables.documents(s, dir), col("doc_id"), col("text"), merges)
        .select(col("doc_id"), col("n_bpe_tokens"),
          substring(md5(array_join(col("bpe_tokens"), " ")), 1, 8).as("units_md5"))
        .orderBy("doc_id")
    }),

    // Deequ-style declarative constraint suite: six checks over orders
    // computed in ONE aggregation pass (plan-asserted in ChecksSpec).
    "c18_quality_checks" -> ((s, dir) => {
      Checks.audit(Tables.orders(s, dir), Seq(
          Checks.RowCountBetween(1, 10000000),
          Checks.NotNull("o_custkey", maxNullFrac = 0.0),
          Checks.Unique("o_orderkey", maxDupFrac = 0.0),
          Checks.InRange("o_totalprice", 1.0, 300000.0, maxViolFrac = 0.05),
          Checks.InSet("o_orderstatus", Seq("O", "F", "P")),
          Checks.MatchesRegex("o_orderpriority", "^[1-5]-[A-Z ]+$", minMatchFrac = 0.9)))
        .orderBy("check")
    }),

    // CCNet-style LM quality signal: per-document cross-entropy under
    // the corpus unigram distribution (bits/token) — both tails are
    // filter targets (boilerplate low, gibberish high).
    "d35_doc_xentropy" -> ((s, dir) => {
      graft.text.CorpusStats.docCrossEntropy(Tables.documents(s, dir),
          col("doc_id"), col("text"))
        .orderBy("doc_id")
    }),

    // Order-2 upgrade of d35: cross-entropy under the interpolated
    // BIGRAM corpus LM (λ·P(w|prev) + (1−λ)·unigram floor). The
    // first-order-structure signal: a scrambled token bag scores
    // exactly like clean text under d35's unigram model but high here.
    "d37_bigram_xentropy" -> ((s, dir) => {
      graft.text.CorpusStats.docBigramCrossEntropy(Tables.documents(s, dir),
          col("doc_id"), col("text"), lambda = 0.8)
        .orderBy("doc_id")
    }),

    // Leakage-safe train/val/test split: assignment keyed on the
    // CONTENT fingerprint so normalized-identical documents co-assign;
    // the per-document assignment itself is hash-checked.
    "d33_leakage_split" -> ((s, dir) => {
      Sampling.leakageSafeSplit(Tables.documents(s, dir), col("text"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split"))
        .orderBy("doc_id")
    }),

    // fastText-style hashed-bag-of-words scoring: the model rides into
    // the plan as a literal weight array, inference is a zero-shuffle
    // narrow map; md5-derived buckets make the oracle bit-exact.
    "d32_classifier_score" -> ((s, dir) => {
      graft.text.Classifier.scoreDocuments(Tables.documents(s, dir),
          col("doc_id"), col("text"), d32Weights, d32Bias)
        .select(col("doc_id"), round(col("score"), 4).as("score"))
        .orderBy("doc_id")
    }),

    // Exactly-k weighted sample without replacement (Efraimidis-
    // Spirakis race): 50 documents drawn ∝ length — a narrow map +
    // TakeOrdered, no corpus shuffle; the oracle replays the identical
    // deterministic race.
    "d74_weighted_sample" -> ((s, dir) => {
      Sampling.weightedSampleK(Tables.documents(s, dir),
          key = col("doc_id"), weight = col("n_chars"), k = 50, salt = "wsk")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    }),

    // PCA spectrum certificate: the distributed moment pass + driver
    // Jacobi eigensolve, checked through two orthogonal-invariants the
    // oracle recomputes from the raw covariance — Σλ = trace certifies
    // the one-pass Gram aggregation, Σλ² = ‖C‖²_F holds ONLY for a
    // fully-diagonalized spectrum, certifying eigensolve convergence.
    "d77_pca_spectrum" -> ((s, dir) => {
      import s.implicits._
      val m = graft.vectors.Pca.fit(Tables.embeddings(s, dir), "embedding", dim = 64, k = 64)
      Seq((m.n, m.eigenvalues.sum, m.eigenvalues.map(l => l * l).sum))
        .toDF("n", "tr", "fr")
        .select(col("n"), round(col("tr"), 4).as("trace"), round(col("fr"), 4).as("frob2"))
    }),

    // Margin-based aligned-pair mining across label groups (the LASER
    // bitext criterion): cosine rescaled by both endpoints' top-k
    // neighborhood density — hub-proof where a raw cosine cut is not.
    "d82_margin_pairs" -> ((s, dir) => {
      graft.similarity.Mining.marginPairs(Tables.embeddings(s, dir),
          "vec_id", "embedding", "label", 0, 1, k = 4, minMargin = 1.05)
        .select(col("a_id"), col("b_id"),
          round(col("cos"), 4).as("cosine"), round(col("margin"), 4).as("margin"))
        .orderBy("a_id", "b_id")
    }),

    // Semantic (embedding-space) contamination with IN-PLAN planted
    // leaks: scaled copies of the eval vectors (cosine exactly 1 —
    // scaling is cosine-invariant) hide among the train slice; the
    // detector must flag exactly the planted pairs, since the natural
    // cross-slice cosine ceiling sits far below the threshold.
    "d81_semantic_contam" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val evalSet = emb.filter(col("vec_id") < 25)
      val planted = evalSet.select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"), col("label"))
      val train = emb.filter(col("vec_id") >= 25).unionByName(planted)
      graft.similarity.Ann.contaminationPairs(train, evalSet, "vec_id", "embedding",
          threshold = 0.95)
        .select(col("cid"), col("eval_id"), round(col("cos"), 4).as("cosine"))
        .orderBy("eval_id")
    }),

    // N-gram novelty of a held-out slice against the remaining corpus:
    // the memorization/overlap audit per source. Exact path (gram-hash
    // joins, md5-60 keys) so the oracle mirrors bit-for-bit.
    "d80_novelty" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val gen = docs.filter(col("doc_id") % 7 === 0)
      val ref = docs.filter(col("doc_id") % 7 =!= 0)
      graft.text.Novelty.ngramNovelty(gen, ref, col("doc_id"), col("text"), n = 3)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_grams").as("grams"),
          sum("n_seen").as("seen"), round(avg("novelty"), 4).as("avg_novelty"))
        .orderBy("source")
    }),

    // Product quantization at rounds=0: the md5-deterministic seed rule
    // makes the WHOLE model a pure function of the data, so the oracle
    // rebuilds the codebooks and replays encode (argmin, ties to lowest
    // code) — per-subspace code usage and quantization error must agree.
    // Lloyd refinement (data-dependent fp iteration) is PqSpec's job.
    "d78_pq_encode" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val model = graft.vectors.Pq.train(emb, "vec_id", "embedding",
        dim = 64, m = 8, kCodes = 16, rounds = 0)
      emb.select(graft.vectors.VectorOps.toDouble(col("embedding")).as("v"))
        .withColumn("codes", model.encode(col("v")))
        .withColumn("recon", model.decode(col("codes")))
        .withColumn("errs", transform(sequence(lit(0), lit(7)), j =>
          aggregate(zip_with(
            slice(col("v"), j * 8 + 1, lit(8)),
            slice(col("recon"), j * 8 + 1, lit(8)),
            (a, b) => (a - b) * (a - b)), lit(0.0), _ + _)))
        .select(posexplode(arrays_zip(col("codes").as("c"), col("errs").as("e")))
          .as(Seq("j", "s")))
        .groupBy("j")
        .agg(countDistinct(col("s.c")).as("n_codes_used"),
          round(avg(col("s.e")), 4).as("avg_err"))
        .orderBy("j")
    }),

    // Encoding-health audit with in-plan corruption: a deterministic
    // md5 half of each source's docs gets the Latin-1-misdecode
    // signature planted ('a' → 'Ã©', exactly what a misread 'é'
    // becomes), the detector counts signature chars, and the native
    // repair is checked against the semantic expectation — all counts
    // mirrorable, the fixer itself exercised by the n_fixed column.
    "d72_mojibake" -> ((s, dir) => {
      val parity = Sampling.hashBucket(col("doc_id"), "moji") % 2 === 0
      val asciiOnly = !col("text").rlike("[^\\x00-\\x7f]")
      val corrupt = when(col("__p"), regexp_replace(col("text"), lit("a"), lit("Ã©")))
        .otherwise(col("text"))
      val staged = Tables.documents(s, dir)
        .select(col("source"), col("text"), parity.as("__p"), asciiOnly.as("__a"))
        .withColumn("__c", corrupt)
        .withColumn("__e", when(col("__p") && col("__a"),
          regexp_replace(col("text"), lit("a"), lit("é"))).otherwise(col("__c")))
        .withColumn("__art", graft.text.Mojibake.artifactCount(col("__c")))
        .withColumn("__fixed", graft.text.Mojibake.fix(col("__c")))
      staged.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("__p"), 1L).otherwise(0L)).as("n_corrupted"),
          sum(when(col("__a"), 1L).otherwise(0L)).as("n_ascii"),
          sum(when(col("__art") > 0, 1L).otherwise(0L)).as("n_flagged"),
          sum(col("__art")).as("artifacts"),
          sum(when(col("__p") && col("__a") && col("__fixed") === col("__e"), 1L)
            .otherwise(0L)).as("n_fixed"),
          sum(when(!col("__p") && col("__a") && col("__fixed") === col("__c"), 1L)
            .otherwise(0L)).as("n_clean_untouched"))
        .orderBy("source")
    }),

    // k-anonymity + l-diversity privacy audit over (nation, balance
    // band) quasi-identifiers with the market segment as the sensitive
    // attribute — one partial-agg shuffle over the quasi key; the
    // structural re-identification risk d20's pattern redaction can't
    // see.
    "d71_k_anonymity" -> ((s, dir) => {
      graft.etl.Privacy.kAnonymityAudit(Tables.customer(s, dir),
          quasi = Seq(col("c_nationkey"),
            floor(col("c_acctbal") / 2000).cast("long")),
          k = 5, sensitive = Some(col("c_mktsegment")))
        .select(col("k"), col("n_rows"), col("n_groups"), col("min_group_size"),
          col("n_risky_groups"), col("n_rows_at_risk"),
          round(col("risk_share"), 4).as("risk_share"), col("min_l_diversity"))
    }),

    // Over-merge audit of the d15 component stack: per-cluster edge
    // density + similarity floor, the chain-merge visibility report.
    "d70_cluster_audit" -> ((s, dir) => {
      Dedup.clusterQuality(Tables.documents(s, dir), col("doc_id"), col("text"),
          threshold = 0.5)
        .orderBy("cluster_id")
    }),

    // Blocker-quality report: the d66 sorted-neighborhood candidates
    // scored against the exact-Jaccard truth — recall/precision the
    // oracle recomputes from scratch.
    "d69_blocker_eval" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cand = graft.dedup.SortedNeighborhood.neighborPairs(docs,
        col("doc_id"), Seq(col("n_chars")), window = 10)
      graft.dedup.BlockerEval.report(docs, col("doc_id"), col("text"), cand,
        threshold = 0.5)
    }),

    // T5-style span corruption: hash-seeded mask starts, trailing-max
    // span membership, ordered sentinel numbering — the whole
    // (input, target) construction replayed by the oracle via md5s.
    "d68_span_corrupt" -> ((s, dir) => {
      graft.text.Augment.spanCorrupt(Tables.documents(s, dir), col("doc_id"), col("text"),
          startRate = 0.05, spanLen = 3, seed = 42)
        .select(col("doc_id"), col("n_tokens"), col("n_masked"), col("n_spans"),
          substring(md5(col("input_text")), 1, 8).as("input_md5"),
          substring(md5(col("target_text")), 1, 8).as("target_md5"))
        .orderBy("doc_id")
    }),

    // Near-dup-safe splits: cluster labels (not doc ids) are hashed to
    // splits, so lightly-edited copies co-assign. Grouped output keeps
    // the oracle discriminating (counts, cluster counts, id checksum).
    "d67_cluster_safe_split" -> ((s, dir) => {
      Dedup.clusterSafeSplit(Tables.documents(s, dir), col("doc_id"), col("text"),
          Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)), threshold = 0.5)
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("cluster_id")).as("n_clusters"),
          sum(col("doc_id")).as("doc_id_sum"))
        .orderBy("split")
    }),

    // Sorted-neighborhood blocking by document length, exact-Jaccard
    // verified — the deterministic-candidate-count blocker next to
    // d2's MinHash banding, over the same corpus and verify stage.
    "d66_sorted_neighborhood" -> ((s, dir) => {
      graft.dedup.SortedNeighborhood.nearDupPairs(Tables.documents(s, dir),
          col("doc_id"), col("text"), Seq(col("n_chars")), window = 10, threshold = 0.5)
        .orderBy("doc_a", "doc_b")
    }),

    // Per-label embedding cohesion/separation QA over the labeled
    // corpus — negative margins would flag non-separable classes.
    "d65_label_cohesion" -> ((s, dir) => {
      graft.similarity.Cohesion.labelCohesion(Tables.embeddings(s, dir),
          col("vec_id"), col("embedding"), col("label"))
        .select(col("label"), col("n"), round(col("cohesion"), 4).as("cohesion"),
          round(col("separation"), 4).as("separation"), round(col("margin"), 4).as("margin"))
        .orderBy("label")
    }),

    // Hybrid retrieval: BM25 lexical top-20 and embedding-cosine
    // top-20 fused by reciprocal rank (k=60). The two id universes
    // (doc_id / vec_id) coincide in the synthetic corpus, so agreement
    // boosts are real; the oracle replays both full ranking chains and
    // the fusion arithmetic.
    "d64_hybrid_rrf" -> ((s, dir) => {
      import s.implicits._
      val qs = Seq((1L, "spark sort merge"), (2L, "stream window value"),
        (3L, "filter scan column")).toDF("query_id", "query_text")
      val lex = graft.text.Bm25.retrieve(Tables.documents(s, dir),
          col("doc_id"), col("text"), qs, k = 20)
        .select(col("query_id").as("qid"), col("doc_id").as("id"), col("rank"))
      val emb = Tables.embeddings(s, dir)
      val dense = Ann.bruteForceTopK(emb,
          emb.filter(col("vec_id").isin(1L, 2L, 3L)), "vec_id", "embedding", k = 20)
        .select(col("qid"), col("cid").as("id"), col("rank"))
      graft.similarity.Fusion.rrfFuse(Seq(lex, dense), topK = 10)
        .select(col("qid"), col("id"), round(col("rrf"), 6).as("rrf"),
          col("n_lists"), col("rank"))
        .orderBy("qid", "rank")
    }),

    // Native one-pass unicode + whitespace normalization. Each document
    // is decorated with a unicode-special envelope (curly quotes, NBSP,
    // zero-width, control, em-dash, ellipsis, CRLF, newline runs —
    // built char-identically in the oracle via chr()), so every mapping
    // class is exercised on every row, not just on whatever the
    // synthetic corpus happens to contain.
    "d63_text_normalize" -> ((s, dir) => {
      val suffix = " \u2014 \u201Cq\u2018x\u2019\u00A0z\u200B\u0007\t\ttail\u2026\r\n\n\n\n"
      val deco = concat(lit("  "), col("text"), lit(suffix))
      Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.expressions.TextExpressions.textNormalize(deco).as("norm"))
        .select(col("doc_id"), length(col("norm")).as("n_norm"),
          substring(md5(col("norm")), 1, 8).as("norm_md5"))
        .orderBy("doc_id")
    }),

    // Content-defined chunking dedup: boundary-stable chunk table over
    // the corpus, grouped by chunk hash — the top duplicated chunks a
    // CDC store would physically dedup. Zero-shuffle chunking on the
    // scan; the hash groupBy is the only exchange.
    "d83_cdc_chunks" -> ((s, dir) => {
      val chunks = graft.dedup.Cdc.cdcChunks(Tables.documents(s, dir),
        col("doc_id"), col("text"), window = 16, marker = "0")
      chunks.groupBy(col("chunk_hash").as("h"))
        .agg(count(lit(1)).as("n_copies"), min(col("chunk_len")).as("len"),
          ((count(lit(1)) - 1) * min(col("chunk_len"))).as("saved_chars"))
        .filter(col("n_copies") > 1)
        .orderBy(col("saved_chars").desc, col("h")).limit(20)
    }),

    // CDC revision delta between two synthesized snapshots (every %3rd
    // doc prefix-edited, %7th absent before = added, %11th absent
    // after = deleted): per-status doc counts + exact-decimal mean
    // change ratio. The append-edit docs score near 0, not 1 — the
    // boundary re-alignment property, measured on the corpus.
    "d83b_cdc_change" -> ((s, dir) => {
      import graft.dedup.Cdc
      val base = Tables.documents(s, dir)
        .filter(col("text").isNotNull && length(col("text")) > 0)
      val before = base.filter(col("doc_id") % 7 =!= 0)
        .withColumn("text", when(col("doc_id") % 3 === 0,
          concat(lit("EDIT: "), col("text"))).otherwise(col("text")))
      val after = base.filter(col("doc_id") % 11 =!= 0)
      Cdc.changeRatio(
          Cdc.cdcChunks(before, col("doc_id"), col("text"), marker = "0"),
          Cdc.cdcChunks(after, col("doc_id"), col("text"), marker = "0"))
        .groupBy("status")
        .agg(count(lit(1)).as("n_docs"),
          when(count(col("change_ratio")) > 0,
            round(sum(col("change_ratio").cast("decimal(10,6)")).cast("double") /
              count(col("change_ratio")), 6)).as("mean_ratio"),
          sum(col("shared_chars")).as("shared_total"))
        .orderBy("status")
    })
  )

  /** Per-document Gopher QUALITY flags as a reusable CTE chain ending
    * in `qf(doc_id, source, ok_*, keep)` — the d41 rule set factored so
    * the d45 pipeline oracle can compose it. */
  private def gopherQualityCtes: String =
    """qt AS (SELECT doc_id, source, text,
      |   string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS t FROM documents),
      |qm AS (SELECT doc_id, source,
      |   len(t) AS nw,
      |   list_aggregate(list_transform(t, x -> length(x)), 'sum') * 1.0 / len(t) AS mean_len,
      |   ((length(text) - length(replace(text, '#', ''))) * 1.0
      |     + len(regexp_extract_all(text, '(\.{3}|…)'))) / greatest(len(t), 1) AS sym_ratio,
      |   len(list_filter(t, x -> regexp_matches(x, '[a-z]'))) * 1.0 / greatest(len(t), 1) AS alpha_ratio,
      |   len(list_filter(t, x -> x IN ('the','be','to','of','and','that','have','with'))) AS n_stop,
      |   list_filter(string_split(text, chr(10)), l -> length(trim(l)) > 0) AS lines
      |  FROM qt),
      |qf AS (SELECT doc_id, source,
      |   (nw >= 50 AND nw <= 100000) AS ok_words,
      |   (mean_len >= 3.0 AND mean_len <= 10.0) AS ok_mean,
      |   (sym_ratio <= 0.1) AS ok_sym,
      |   (alpha_ratio >= 0.8) AS ok_alpha,
      |   (n_stop >= 2) AS ok_stop,
      |   (len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]'))) * 1.0
      |      / greatest(len(lines), 1) <= 0.9) AS ok_bullet,
      |   (len(list_filter(lines, l -> regexp_matches(trim(l), '(\.{3}|…)$'))) * 1.0
      |      / greatest(len(lines), 1) <= 0.3) AS ok_ellipsis
      |  FROM qm)""".stripMargin

  /** The d42 oracle's CTE chain, generated per n (top n = 2..4, dup
    * n = 5..10) so the nine structurally-identical gram CTEs stay
    * maintainable, ending in per-document
    * `fl(doc_id, source, top2, dlcf, ok_*, keep)`.
    * Mirrors GopherRepetition exactly: empty tokens filtered before
    * shingling, per-doc gram counts via unnest+GROUP BY (the oracle may
    * explode; the engine must not), top tie-break = max chars among
    * max-count grams, duplicated chars = Σ c·len over grams with c ≥ 2,
    * denominators = greatest(normalized length, 1). */
  private def gopherRepetitionCtes: String = {
    val tops = Seq((2, "0.20"), (3, "0.18"), (4, "0.16"))
    val dups = Seq((5, "0.15"), (6, "0.14"), (7, "0.13"), (8, "0.12"), (9, "0.11"), (10, "0.10"))
    val ns = tops.map(_._1) ++ dups.map(_._1)
    val gramCtes = ns.map { n =>
      s"""g$n AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(t) - ${n - 2}, 1)),
         |   i -> array_to_string(list_slice(t, i, i + ${n - 1}), ' '))) AS g FROM tok),
         |c$n AS (SELECT doc_id, g, count(*) AS c, length(g) AS gl FROM g$n GROUP BY 1, 2),
         |m$n AS (SELECT doc_id, max(c) AS mx,
         |   CAST(sum(CASE WHEN c >= 2 THEN c * gl ELSE 0 END) AS BIGINT) AS dup FROM c$n GROUP BY 1)""".stripMargin
    }
    val topCtes = tops.map { case (n, _) =>
      s"""t$n AS (SELECT c.doc_id, max(c.c * c.gl) AS top FROM c$n c
         |   JOIN m$n m ON c.doc_id = m.doc_id AND c.c = m.mx GROUP BY 1)""".stripMargin
    }
    val fCols =
      tops.map { case (n, _) => s"coalesce(t$n.top, 0) * 1.0 / k.nchars AS top$n" } ++
        dups.map { case (n, _) => s"coalesce(m$n.dup, 0) * 1.0 / k.nchars AS dup$n" }
    val fJoins =
      tops.map { case (n, _) => s"LEFT JOIN t$n ON t$n.doc_id = k.doc_id" } ++
        dups.map { case (n, _) => s"LEFT JOIN m$n ON m$n.doc_id = k.doc_id" }
    val okTop = tops.map { case (n, cap) => s"top$n <= $cap" }.mkString(" AND ")
    val okDup = dups.map { case (n, cap) => s"dup$n <= $cap" }.mkString(" AND ")
    s"""base AS (SELECT doc_id, source, text,
       |   regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm FROM documents),
       |tok AS (SELECT doc_id, source, greatest(length(norm), 1) AS nchars,
       |   list_filter(string_split(norm, ' '), x -> length(x) > 0) AS t,
       |   list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)), x -> length(x) > 0) AS ls,
       |   list_filter(list_transform(string_split_regex(text, '\\n{2,}'), x -> trim(x)), x -> length(x) > 0) AS ps
       |  FROM base),
       |lm AS (SELECT doc_id,
       |   CASE WHEN len(ls) > 0 THEN (len(ls) - len(list_distinct(ls))) * 1.0 / len(ls) ELSE 0.0 END AS dlf,
       |   CASE WHEN coalesce(list_aggregate(list_transform(ls, x -> length(x)), 'sum'), 0) > 0
       |     THEN (list_aggregate(list_transform(ls, x -> length(x)), 'sum')
       |           - coalesce(list_aggregate(list_transform(list_distinct(ls), x -> length(x)), 'sum'), 0)) * 1.0
       |          / list_aggregate(list_transform(ls, x -> length(x)), 'sum') ELSE 0.0 END AS dlcf,
       |   CASE WHEN len(ps) > 0 THEN (len(ps) - len(list_distinct(ps))) * 1.0 / len(ps) ELSE 0.0 END AS dpf,
       |   CASE WHEN coalesce(list_aggregate(list_transform(ps, x -> length(x)), 'sum'), 0) > 0
       |     THEN (list_aggregate(list_transform(ps, x -> length(x)), 'sum')
       |           - coalesce(list_aggregate(list_transform(list_distinct(ps), x -> length(x)), 'sum'), 0)) * 1.0
       |          / list_aggregate(list_transform(ps, x -> length(x)), 'sum') ELSE 0.0 END AS dpcf
       |  FROM tok),
       |${gramCtes.mkString(",\n")},
       |${topCtes.mkString(",\n")},
       |f AS (SELECT k.doc_id, k.source, lm.dlf, lm.dlcf, lm.dpf, lm.dpcf,
       |   ${fCols.mkString(",\n   ")}
       |  FROM tok k JOIN lm ON lm.doc_id = k.doc_id
       |  ${fJoins.mkString("\n  ")}),
       |fl AS (SELECT doc_id, source, top2, dlcf,
       |   (dlf <= 0.30) AS ok_dl, (dlcf <= 0.20) AS ok_dlc,
       |   (dpf <= 0.30) AS ok_dp, (dpcf <= 0.20) AS ok_dpc,
       |   ($okTop) AS ok_top, ($okDup) AS ok_dup FROM f)""".stripMargin
  }

  private def d42Oracle: String =
    s"""WITH $gopherRepetitionCtes
       |SELECT source, count(*) AS n_docs,
       | CAST(sum(CASE WHEN ok_dl AND ok_dlc AND ok_dp AND ok_dpc AND ok_top AND ok_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       | CAST(sum(CASE WHEN NOT ok_dl THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_dup_lines,
       | CAST(sum(CASE WHEN NOT ok_dlc THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_dup_line_chars,
       | CAST(sum(CASE WHEN NOT ok_dp THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_dup_paras,
       | CAST(sum(CASE WHEN NOT ok_dpc THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_dup_para_chars,
       | CAST(sum(CASE WHEN NOT ok_top THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_top_ngrams,
       | CAST(sum(CASE WHEN NOT ok_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_dup_ngrams,
       | round(avg(top2), 4) AS avg_top_2gram,
       | round(avg(dlcf), 4) AS avg_dup_line_chars
       |FROM fl GROUP BY source ORDER BY source""".stripMargin

  /** The d45 pipeline oracle: quality + repetition per-doc fragments,
    * then gate → exact keep-first dedup → paragraph keep-first dedup →
    * per-source funnel, every output column an exact integer. */
  private def d45Oracle: String =
    s"""WITH $gopherQualityCtes,
       |$gopherRepetitionCtes,
       |gq AS (SELECT doc_id, (ok_words AND ok_mean AND ok_sym AND ok_alpha AND ok_stop
       |    AND ok_bullet AND ok_ellipsis) AS keepq FROM qf),
       |gr AS (SELECT doc_id, (ok_dl AND ok_dlc AND ok_dp AND ok_dpc AND ok_top AND ok_dup) AS keepr FROM fl),
       |gd AS (SELECT b.doc_id, b.source, b.text FROM documents b
       |  JOIN gq ON gq.doc_id = b.doc_id
       |  JOIN gr ON gr.doc_id = b.doc_id
       |  WHERE gq.keepq AND gr.keepr),
       |ex AS (SELECT doc_id, source, text,
       |   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp FROM gd),
       |win AS (SELECT fp, min(doc_id) AS d0 FROM ex GROUP BY 1),
       |kept AS (SELECT ex.doc_id, ex.text FROM ex JOIN win ON ex.fp = win.fp AND ex.doc_id = win.d0),
       |pp0 AS (SELECT doc_id, string_split_regex(text, '\\n{2,}') AS arr FROM kept),
       |pp AS (SELECT doc_id, i - 1 AS pos, arr[i] AS para,
       |   md5(regexp_replace(lower(trim(arr[i])), '\\s+', ' ', 'g')) AS pfp
       |  FROM pp0, UNNEST(range(1, len(arr) + 1)) AS u(i)
       |  WHERE length(trim(arr[i])) > 0),
       |pw1 AS (SELECT pfp, min(doc_id) AS d0 FROM pp GROUP BY 1),
       |pw2 AS (SELECT pp.pfp, min(pp.pos) AS p0 FROM pp JOIN pw1 ON pp.pfp = pw1.pfp AND pp.doc_id = pw1.d0 GROUP BY 1),
       |pk AS (SELECT pp.doc_id, pp.para, (pp.doc_id = pw1.d0 AND pp.pos = pw2.p0) AS keep
       |  FROM pp JOIN pw1 ON pp.pfp = pw1.pfp JOIN pw2 ON pp.pfp = pw2.pfp),
       |pd AS (SELECT doc_id, count(*) AS n_paras,
       |   CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |   CAST(sum(CASE WHEN keep THEN len(list_filter(
       |       string_split(regexp_replace(lower(trim(para)), '\\s+', ' ', 'g'), ' '),
       |       x -> length(x) > 0)) ELSE 0 END) AS BIGINT) AS n_tok
       |  FROM pk GROUP BY 1),
       |mm AS (SELECT b.doc_id, b.source,
       |   (gq.keepq AND gr.keepr) AS gate,
       |   (k.doc_id IS NOT NULL) AS ex_keep,
       |   coalesce(pd.n_paras, 0) AS n_paras, coalesce(pd.n_kept, 0) AS n_kept,
       |   coalesce(pd.n_tok, 0) AS n_tok
       |  FROM documents b
       |  JOIN gq ON gq.doc_id = b.doc_id
       |  JOIN gr ON gr.doc_id = b.doc_id
       |  LEFT JOIN kept k ON k.doc_id = b.doc_id
       |  LEFT JOIN pd ON pd.doc_id = b.doc_id)
       |SELECT source, count(*) AS n_docs,
       | CAST(sum(CASE WHEN gate THEN 1 ELSE 0 END) AS BIGINT) AS n_gated,
       | CAST(sum(CASE WHEN ex_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_kept,
       | CAST(sum(CASE WHEN ex_keep THEN n_paras ELSE 0 END) AS BIGINT) AS n_paras,
       | CAST(sum(CASE WHEN ex_keep THEN n_kept ELSE 0 END) AS BIGINT) AS n_kept_paras,
       | CAST(sum(CASE WHEN ex_keep THEN n_tok ELSE 0 END) AS BIGINT) AS n_tokens_clean
       |FROM mm GROUP BY source ORDER BY source""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "d1_dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_hash,
        | min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin,

    // d2 emits MinHash candidates verified to exact Jaccard ≥ 0.5; with
    // b=8/r=4 the composed result equals the full exact pair set (see
    // the query comment), so the oracle is the exact formulation.
    "d2_dedup_minhash" ->
      """WITH toks AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
        |       FROM toks, UNNEST(range(1, len(t)-1)) AS u(i)),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        |      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1,2)
        |SELECT doc_a, doc_b, round(inter*1.0/(x.n + y.n - inter),4) AS jaccard
        |FROM p JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
        |WHERE inter*1.0/(x.n + y.n - inter) >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,

    "d3_dedup_simhash" ->
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(regexp_replace(lower(trim(text)),'\\s+',' ','g'), ' ')) AS w FROM documents),
         |h AS (SELECT doc_id, CAST('0x' || substr(md5(w),1,15) AS BIGINT) AS h FROM toks),
         |v AS (SELECT doc_id, $simHashVotesSql FROM h GROUP BY doc_id),
         |s AS (SELECT doc_id, $simHashBitsSql AS sim FROM v)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         | CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
         |FROM s a JOIN s b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sim, b.sim)) <= 3 ORDER BY doc_a, doc_b""".stripMargin,

    // Mirrors the maxDf=100 stop-shingle cap: shingles in >100 documents
    // leave the universe before sizes and intersections are counted.
    // d4's inverted-index chain with the containment score and the
    // contained-side (smaller capped set, ties → doc_a) attribution.
    "d62_containment" ->
      """WITH toks AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS t FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
        |       FROM toks, UNNEST(range(1, len(t)-1)) AS u(i)),
        |keep AS (SELECT g FROM sh0 GROUP BY g HAVING count(*) <= 100),
        |sh AS (SELECT sh0.doc_id, sh0.g FROM sh0 JOIN keep USING (g)),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        |      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1,2)
        |SELECT doc_a, doc_b, round(inter*1.0/least(x.n, y.n),4) AS containment,
        |  CASE WHEN x.n <= y.n THEN doc_a ELSE doc_b END AS contained
        |FROM p JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
        |WHERE inter*1.0/least(x.n, y.n) >= 0.8 ORDER BY doc_a, doc_b""".stripMargin,

    "d4_ngram_jaccard" ->
      """WITH toks AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS t FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
        |       FROM toks, UNNEST(range(1, len(t)-1)) AS u(i)),
        |keep AS (SELECT g FROM sh0 GROUP BY g HAVING count(*) <= 100),
        |sh AS (SELECT sh0.doc_id, sh0.g FROM sh0 JOIN keep USING (g)),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        |      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1,2)
        |SELECT doc_a, doc_b, round(inter*1.0/(x.n + y.n - inter),4) AS jaccard
        |FROM p JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
        |WHERE inter*1.0/(x.n + y.n - inter) >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,

    "d26_source_divergence" ->
      """WITH tok AS (SELECT source, unnest(string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ')) AS t FROM documents),
        |bs AS (SELECT source, t, count(*) AS c_st FROM tok GROUP BY 1,2),
        |ts AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s FROM bs GROUP BY 1),
        |g AS (SELECT t, CAST(sum(c_st) AS BIGINT) AS c_t FROM bs GROUP BY 1),
        |tot AS (SELECT CAST(sum(c_st) AS DOUBLE) AS n_total FROM bs)
        |SELECT bs.source, max(ts.n_s) AS n_tokens, count(*) AS n_distinct,
        | round(sum((c_st*1.0/n_s) * log2((c_st*1.0/n_s) / (c_t/n_total))), 4) AS kl_bits
        |FROM bs JOIN g USING (t) JOIN ts ON bs.source = ts.source, tot
        |GROUP BY 1 ORDER BY bs.source""".stripMargin,

    // Mirrors the whole rebalance derivation: per-stratum counts, the
    // binding total T = min(n/w), per-stratum ppm cutoffs (same
    // left-associative double arithmetic and half-up rounding as the
    // Spark plan), then the identical md5 bucket selection as d14.
    "d27_rebalance_mix" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |w AS (SELECT * FROM (VALUES ('en', CAST(0.4 AS DOUBLE)), ('de', CAST(0.3 AS DOUBLE)),
        |                     ('es', CAST(0.2 AS DOUBLE)), ('fr', CAST(0.1 AS DOUBLE))) AS v(lang, w)),
        |t AS (SELECT min(n / w) AS T FROM c JOIN w USING (lang)),
        |f AS (SELECT c.lang, CAST(round(w.w * t.T / c.n * 1000000) AS BIGINT) AS cut
        |      FROM c JOIN w USING (lang) CROSS JOIN t),
        |b AS (SELECT lang, text,
        |  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000 AS bucket
        | FROM documents)
        |SELECT b.lang, count(*) AS n_kept, CAST(sum(length(b.text)) AS BIGINT) AS sum_chars
        |FROM b JOIN f USING (lang) WHERE b.bucket < f.cut
        |GROUP BY 1 ORDER BY lang""".stripMargin,

    // Same md5-bucket machinery as d27; the cutoffs come from the
    // observed counts through pow/min instead of a weights table.
    "d55_temperature_mix" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |t AS (SELECT min(n / pow(n, 0.5)) AS T FROM c),
        |f AS (SELECT c.lang, CAST(round(pow(c.n, 0.5) * t.T / c.n * 1000000) AS BIGINT) AS cut
        |      FROM c CROSS JOIN t),
        |b AS (SELECT lang, text,
        |  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000 AS bucket
        | FROM documents)
        |SELECT b.lang, count(*) AS n_kept, CAST(sum(length(b.text)) AS BIGINT) AS sum_chars
        |FROM b JOIN f USING (lang) WHERE b.bucket < f.cut
        |GROUP BY 1 ORDER BY lang""".stripMargin,

    // d15's recursive-components oracle extended with cluster sizes
    // and the 1/size weight, singletons coalescing to weight 1.
    "d61_soft_dedup" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
        |       FROM toks, UNNEST(range(1, len(t)-1)) AS u(i)),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        |      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1,2),
        |dup AS (SELECT doc_a, doc_b FROM p JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
        |        WHERE inter*1.0/(x.n + y.n - inter) >= 0.5),
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM dup UNION SELECT doc_b, doc_a FROM dup),
        |reach(id, r) AS (SELECT src, src FROM e
        |  UNION SELECT reach.id, e.dst FROM reach JOIN e ON reach.r = e.src),
        |cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY 1),
        |szc AS (SELECT cluster_id, count(*) AS csz FROM cl GROUP BY 1)
        |SELECT d.doc_id,
        | CAST(coalesce(cl.cluster_id, d.doc_id) AS BIGINT) AS cluster_id,
        | CAST(coalesce(szc.csz, 1) AS BIGINT) AS cluster_size,
        | round(1.0 / coalesce(szc.csz, 1), 6) AS weight
        |FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
        |LEFT JOIN szc ON cl.cluster_id = szc.cluster_id
        |ORDER BY d.doc_id""".stripMargin,

    // Serpentine head striping + md5 tail assignment replayed: rank
    // over the top 32 by (tokens DESC, doc_id), fold (r-1) mod 16,
    // hashBucket % 8 for the rest.
    "d60_balanced_shards" ->
      """WITH t AS (SELECT doc_id,
        |  len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS c
        |  FROM documents),
        |top AS (SELECT doc_id, c, row_number() OVER (ORDER BY c DESC, doc_id) AS rk
        |        FROM t ORDER BY c DESC, doc_id LIMIT 32),
        |h AS (SELECT doc_id,
        |  CASE WHEN (rk - 1) % 16 < 8 THEN (rk - 1) % 16 ELSE 15 - ((rk - 1) % 16) END AS shard
        | FROM top),
        |a AS (SELECT t.doc_id, t.c,
        |  coalesce(h.shard,
        |    CAST('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000 % 8) AS shard
        | FROM t LEFT JOIN h ON t.doc_id = h.doc_id)
        |SELECT CAST(shard AS INTEGER) AS shard, count(*) AS n_docs,
        | CAST(sum(c) AS BIGINT) AS sum_tokens
        |FROM a GROUP BY 1 ORDER BY shard""".stripMargin,

    // d31's mask replay with the dup-gram set swapped for the eval
    // slice's distinct grams.
    "d59_decontam_spans" ->
      """WITH toks AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS t
        |              FROM documents WHERE doc_id % 50 <> 0),
        |etoks AS (SELECT string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS t
        |          FROM documents WHERE doc_id % 50 = 0),
        |eg AS (SELECT DISTINCT t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3] AS g
        |       FROM etoks, UNNEST(range(1, len(t)-2)) AS u(i)),
        |g AS (SELECT doc_id, i - 1 AS pos, t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3] AS g
        |      FROM toks, UNNEST(range(1, len(t)-2)) AS u(i)),
        |cov AS (SELECT DISTINCT g.doc_id, g.pos + 1 + o AS i
        |        FROM g JOIN eg USING (g), UNNEST(range(4)) AS v(o)),
        |te AS (SELECT doc_id, i, t[i] AS w FROM toks, UNNEST(range(1, len(t)+1)) AS u(i)),
        |kept AS (SELECT te.doc_id, te.i, te.w FROM te
        |         LEFT JOIN cov ON te.doc_id = cov.doc_id AND te.i = cov.i WHERE cov.i IS NULL),
        |res AS (SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS clean_text, count(*) AS n_kept
        |        FROM kept GROUP BY 1)
        |SELECT toks.doc_id, substr(md5(coalesce(res.clean_text, '')), 1, 8) AS clean_md5,
        | CAST(len(toks.t) AS BIGINT) AS n_tokens, CAST(coalesce(res.n_kept, 0) AS BIGINT) AS n_kept
        |FROM toks LEFT JOIN res ON toks.doc_id = res.doc_id ORDER BY toks.doc_id""".stripMargin,

    // d5's exact ranking with the different-label join predicate.
    "d58_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv, label AS ql
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv, label AS cl FROM embeddings),
        |s AS (SELECT qid, cid,
        |   list_inner_product(qv,cv) / (sqrt(list_inner_product(qv,qv)) * sqrt(list_inner_product(cv,cv))) AS cos
        |  FROM q, c WHERE qid <> cid AND ql <> cl),
        |r AS (SELECT qid, cid, cos,
        |   CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS BIGINT) AS rank FROM s)
        |SELECT qid, cid, round(cos,4) AS cosine, rank FROM r WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    // The same best-first running-sum window: tokens are the engine's
    // normalized whitespace tokens, ranking is (n_chars DESC, doc_id),
    // and the inclusive cumulative token count gates at 600.
    "d57_token_budget" ->
      """WITH t AS (SELECT doc_id, source, n_chars,
        |  len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS n_toks
        |  FROM documents),
        |r AS (SELECT doc_id, source, n_toks,
        |  sum(n_toks) OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id
        |                    ROWS UNBOUNDED PRECEDING) AS cum
        | FROM t)
        |SELECT doc_id, source, CAST(n_toks AS BIGINT) AS n_toks, CAST(cum AS BIGINT) AS cum_cost
        |FROM r WHERE cum <= 600 ORDER BY source, cum_cost, doc_id""".stripMargin,

    // Every C4 rule recomputed in SQL over the same synthesized line
    // structure: slice bounds are the Spark query's (slice(t,a,n) ≡
    // list_slice(t,a,a+n-1)), the line keep predicate, sentence count,
    // and page gates are rule-for-rule mirrors, and the cleaned text
    // is compared via md5 (content, not just counts).
    "d56_c4_filter" ->
      """WITH base AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |synth AS (SELECT doc_id, concat_ws(chr(10),
        |    array_to_string(list_slice(t, 1, 6), ' ') || '.',
        |    array_to_string(list_slice(t, 7, 9), ' '),
        |    array_to_string(list_slice(t, 10, 15), ' ') || '?',
        |    'about javascript and more things here.',
        |    CASE WHEN doc_id % 2 = 0 THEN 'an extra sentence rounds out even documents.' ELSE '' END,
        |    CASE WHEN doc_id % 7 = 0 THEN 'config { x } traced through seven docs.' ELSE '' END,
        |    CASE WHEN doc_id % 11 = 0 THEN 'lorem ipsum dolor sit amet consectetur.' ELSE '' END,
        |    CASE WHEN doc_id % 13 = 0 THEN 'this document regrettably contains badword today.' ELSE '' END
        |  ) AS text FROM base),
        |c AS (SELECT doc_id,
        |  list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)), x -> length(x) > 0) AS lines
        |  FROM synth),
        |k AS (SELECT doc_id, lines,
        |  list_filter(lines, l -> regexp_matches(l, '[.!?]["”'']?$')
        |    AND len(string_split(trim(regexp_replace(l, '\s+', ' ', 'g')), ' ')) >= 5
        |    AND NOT contains(lower(l), 'javascript')) AS kept
        |  FROM c),
        |f AS (SELECT doc_id, lines, kept, array_to_string(kept, chr(10)) AS clean FROM k),
        |g AS (SELECT doc_id, lines, kept, clean,
        |  len(regexp_extract_all(clean, '([.!?]+)', 1)) >= 3 AS ok_sentences,
        |  NOT contains(lower(clean), 'lorem ipsum') AS ok_lorem,
        |  NOT contains(clean, '{') AS ok_brace,
        |  NOT list_contains(string_split(regexp_replace(lower(trim(clean)), '\s+', ' ', 'g'), ' '), 'badword') AS ok_bad_words
        |  FROM f)
        |SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines, CAST(len(kept) AS BIGINT) AS n_kept,
        |  md5(clean) AS clean_md5, ok_sentences, ok_lorem, ok_brace, ok_bad_words,
        |  (ok_sentences AND ok_lorem AND ok_brace AND ok_bad_words) AS keep
        |FROM g ORDER BY doc_id""".stripMargin,

    // Duplicated 4-token windows recomputed from the raw text: same
    // normalization, same window positions, duplicated iff the exact
    // gram occurs in >= 2 distinct documents (the oracle compares gram
    // TEXT; the Spark side's 128-bit md5 keys are collision-free at
    // verification scale).
    "d28_dup_spans" ->
      """WITH toks AS (SELECT doc_id, source, string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS t FROM documents),
        |g AS (SELECT doc_id, source, t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3] AS g
        |      FROM toks, UNNEST(range(1, len(t)-2)) AS u(i)),
        |pg AS (SELECT doc_id, source, g, count(*) AS cnt FROM g GROUP BY 1,2,3),
        |fr AS (SELECT g, count(*) AS n_docs FROM pg GROUP BY 1),
        |d AS (SELECT doc_id, source, sum(cnt) AS nw,
        |       sum(CASE WHEN n_docs >= 2 THEN cnt ELSE 0 END) AS nd
        |      FROM pg JOIN fr USING (g) GROUP BY 1,2)
        |SELECT source, count(*) AS n_docs, CAST(sum(nw) AS BIGINT) AS n_windows,
        | CAST(sum(nd) AS BIGINT) AS n_dup, round(sum(nd)*1.0/sum(nw), 4) AS dup_ratio
        |FROM d GROUP BY 1 ORDER BY source""".stripMargin,

    "d31_span_removal" ->
      """WITH toks AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS t FROM documents),
        |g AS (SELECT doc_id, i - 1 AS pos, t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3] AS g
        |      FROM toks, UNNEST(range(1, len(t)-2)) AS u(i)),
        |dup AS (SELECT g FROM (SELECT DISTINCT doc_id, g FROM g) GROUP BY g HAVING count(*) >= 2),
        |cov AS (SELECT DISTINCT g.doc_id, g.pos + 1 + o AS i
        |        FROM g JOIN dup USING (g), UNNEST(range(4)) AS v(o)),
        |te AS (SELECT doc_id, i, t[i] AS w FROM toks, UNNEST(range(1, len(t)+1)) AS u(i)),
        |kept AS (SELECT te.doc_id, te.i, te.w FROM te
        |         LEFT JOIN cov ON te.doc_id = cov.doc_id AND te.i = cov.i WHERE cov.i IS NULL),
        |res AS (SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS clean_text, count(*) AS n_kept
        |        FROM kept GROUP BY 1)
        |SELECT toks.doc_id, substr(md5(coalesce(res.clean_text, '')), 1, 8) AS clean_md5,
        | CAST(len(toks.t) AS BIGINT) AS n_tokens, CAST(coalesce(res.n_kept, 0) AS BIGINT) AS n_kept
        |FROM toks LEFT JOIN res ON toks.doc_id = res.doc_id ORDER BY toks.doc_id""".stripMargin,

    // Lee-et-al exact-substring removal: TOTAL occurrence counting
    // (within-doc repeats duplicate), globally-first occurrence kept —
    // rn-1 election over (doc_id, pos) replays the min-struct owner.
    "d91_substring_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS t FROM documents),
        |g AS (SELECT doc_id, i - 1 AS pos, t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4] AS g
        |      FROM toks, UNNEST(range(1, len(t)-3)) AS u(i)),
        |occ AS (SELECT doc_id, pos,
        |         count(*) OVER (PARTITION BY g) AS nocc,
        |         row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
        |        FROM g),
        |drop0 AS (SELECT doc_id, pos FROM occ WHERE nocc >= 2 AND rn > 1),
        |cov AS (SELECT DISTINCT doc_id, pos + 1 + o AS i
        |        FROM drop0, UNNEST(range(5)) AS v(o)),
        |te AS (SELECT doc_id, i, t[i] AS w FROM toks, UNNEST(range(1, len(t)+1)) AS u(i)),
        |kept AS (SELECT te.doc_id, te.i, te.w FROM te
        |         LEFT JOIN cov ON te.doc_id = cov.doc_id AND te.i = cov.i WHERE cov.i IS NULL),
        |res AS (SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS clean_text, count(*) AS n_kept
        |        FROM kept GROUP BY 1)
        |SELECT toks.doc_id, substr(md5(coalesce(res.clean_text, '')), 1, 8) AS clean_md5,
        | CAST(len(toks.t) AS BIGINT) AS n_tokens, CAST(coalesce(res.n_kept, 0) AS BIGINT) AS n_kept
        |FROM toks LEFT JOIN res ON toks.doc_id = res.doc_id ORDER BY toks.doc_id""".stripMargin,

    // d31 oracle with per-gram owner election: min-doc_id owner keeps
    // its occurrences, only non-owner occurrences are covered.
    "d31b_span_keepfirst" ->
      """WITH toks AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS t FROM documents),
        |g AS (SELECT doc_id, i - 1 AS pos, t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3] AS g
        |      FROM toks, UNNEST(range(1, len(t)-2)) AS u(i)),
        |dup AS (SELECT g, min(doc_id) AS owner FROM (SELECT DISTINCT doc_id, g FROM g)
        |        GROUP BY g HAVING count(*) >= 2),
        |cov AS (SELECT DISTINCT g.doc_id, g.pos + 1 + o AS i
        |        FROM g JOIN dup USING (g), UNNEST(range(4)) AS v(o)
        |        WHERE g.doc_id <> dup.owner),
        |te AS (SELECT doc_id, i, t[i] AS w FROM toks, UNNEST(range(1, len(t)+1)) AS u(i)),
        |kept AS (SELECT te.doc_id, te.i, te.w FROM te
        |         LEFT JOIN cov ON te.doc_id = cov.doc_id AND te.i = cov.i WHERE cov.i IS NULL),
        |res AS (SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS clean_text, count(*) AS n_kept
        |        FROM kept GROUP BY 1)
        |SELECT toks.doc_id, substr(md5(coalesce(res.clean_text, '')), 1, 8) AS clean_md5,
        | CAST(len(toks.t) AS BIGINT) AS n_tokens, CAST(coalesce(res.n_kept, 0) AS BIGINT) AS n_kept
        |FROM toks LEFT JOIN res ON toks.doc_id = res.doc_id ORDER BY toks.doc_id""".stripMargin,

    "c18_quality_checks" ->
      """WITH m AS (SELECT
        |  CAST(count(*) AS DOUBLE) AS m0,
        |  coalesce(avg(CASE WHEN o_custkey IS NULL THEN 1.0 ELSE 0.0 END), 0.0) AS m1,
        |  CASE WHEN count(o_orderkey) > 0 THEN 1.0 - count(DISTINCT o_orderkey)*1.0/count(o_orderkey) ELSE 0.0 END AS m2,
        |  coalesce(avg(CASE WHEN o_totalprice IS NOT NULL THEN CASE WHEN o_totalprice < 1.0 OR o_totalprice > 300000.0 THEN 1.0 ELSE 0.0 END END), 0.0) AS m3,
        |  coalesce(avg(CASE WHEN o_orderstatus IS NOT NULL THEN CASE WHEN o_orderstatus IN ('O','F','P') THEN 0.0 ELSE 1.0 END END), 0.0) AS m4,
        |  coalesce(avg(CASE WHEN o_orderpriority IS NOT NULL THEN CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$') THEN 1.0 ELSE 0.0 END END), 0.0) AS m5
        | FROM orders)
        |SELECT * FROM (
        | SELECT 'row_count_between(1,10000000)' AS "check", '*' AS "column", round(m0,6) AS metric, 1.0 AS threshold, (m0 >= 1 AND m0 <= 10000000) AS passed FROM m
        | UNION ALL SELECT 'not_null(o_custkey)', 'o_custkey', round(m1,6), 0.0, m1 <= 0.0 FROM m
        | UNION ALL SELECT 'unique(o_orderkey)', 'o_orderkey', round(m2,6), 0.0, m2 <= 0.0 FROM m
        | UNION ALL SELECT 'in_range(o_totalprice)', 'o_totalprice', round(m3,6), 0.05, m3 <= 0.05 FROM m
        | UNION ALL SELECT 'in_set(o_orderstatus)', 'o_orderstatus', round(m4,6), 0.0, m4 <= 0.0 FROM m
        | UNION ALL SELECT 'matches_regex(o_orderpriority)', 'o_orderpriority', round(m5,6), 0.9, m5 >= 0.9 FROM m
        |) ORDER BY "check"""".stripMargin,

    "d35_doc_xentropy" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ')) AS t FROM documents),
        |bd AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY 1,2),
        |g AS (SELECT t, sum(c) AS ct FROM bd GROUP BY 1),
        |tot AS (SELECT sum(ct) AS n FROM g)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        | round(-sum(c * log2(ct*1.0/n))/sum(c), 4) AS xent_bits
        |FROM bd JOIN g USING (t), tot GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Interpolation arithmetic mirrored at DOUBLE precision: the Scala
    // side computes (1.0 − λ) in the plan (not pre-folded), so both
    // engines run the identical IEEE subtraction.
    "d37_bigram_xentropy" ->
      """WITH ts AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS w FROM documents),
        |bgs AS (SELECT doc_id, w[CAST(i AS INT)] AS p, w[CAST(i AS INT) + 1] AS t
        |        FROM ts, UNNEST(range(1, len(w))) AS r(i)),
        |bd AS (SELECT doc_id, p, t, count(*) AS c FROM bgs GROUP BY 1,2,3),
        |bg AS (SELECT p, t, sum(c) AS cpt FROM bd GROUP BY 1,2),
        |ctx AS (SELECT p, sum(cpt) AS cp FROM bg GROUP BY 1),
        |uni AS (SELECT t, sum(cpt) AS ct FROM bg GROUP BY 1),
        |tot AS (SELECT sum(ct) AS n FROM uni)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        | round(-sum(c * log2(CAST(0.8 AS DOUBLE) * (CAST(cpt AS DOUBLE) / cp)
        |   + (CAST(1.0 AS DOUBLE) - CAST(0.8 AS DOUBLE)) * (CAST(ct AS DOUBLE) / n)))/sum(c), 4) AS xent_bits
        |FROM bd JOIN bg USING (p, t) JOIN ctx USING (p) JOIN uni USING (t), tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "d33_leakage_split" ->
      """WITH t AS (SELECT doc_id, md5(regexp_replace(lower(trim(text)),'\s+',' ','g')) AS fp FROM documents),
        |b AS (SELECT doc_id, CAST('0x' || substr(md5(fp), 1, 15) AS BIGINT) % 1000000 AS bk FROM t)
        |SELECT doc_id,
        | CASE WHEN bk < 800000 THEN 'train' WHEN bk < 900000 THEN 'val' ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,

    "d32_classifier_score" -> {
      val values = d32Weights.zipWithIndex
        .map { case (w, i) => s"($i, CAST($w AS DOUBLE))" }.mkString(", ")
      s"""WITH w(i, wt) AS (VALUES $values),
         |toks AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),'\\s+',' ','g'), ' ') AS t FROM documents),
         |e AS (SELECT doc_id, CAST('0x' || substr(md5(tok),1,15) AS BIGINT) % $d32Dim AS i
         |      FROM toks, UNNEST(t) AS u(tok)),
         |sc AS (SELECT e.doc_id, sum(w.wt)/count(*) AS m FROM e JOIN w USING (i) GROUP BY 1)
         |SELECT toks.doc_id, round(1.0/(1.0 + exp(-($d32Bias + coalesce(sc.m, 0.0)))), 4) AS score
         |FROM toks LEFT JOIN sc USING (doc_id) ORDER BY doc_id""".stripMargin
    },

    "d34_bpe_pairs" ->
      """WITH tok AS (SELECT unnest(string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ')) AS w FROM documents),
        |wc AS (SELECT w, count(*) AS wc FROM tok WHERE length(w) > 0 GROUP BY 1),
        |p AS (SELECT substr(w, CAST(i AS INT), 2) AS pair, wc FROM wc, UNNEST(range(1, length(w))) AS u(i)),
        |s AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS n FROM p GROUP BY 1)
        |SELECT pair, n FROM s ORDER BY n DESC, pair LIMIT 20""".stripMargin,

    // Mirrors every Gopher rule: same tokenization, same line split,
    // same integer→double ratio math, so each per-rule fail count (and
    // the keep conjunction) hash-matches. Built from the shared
    // per-document fragment the d45 pipeline oracle composes.
    "d41_gopher_filter" ->
      s"""WITH $gopherQualityCtes
         |SELECT source, count(*) AS n_docs,
         | CAST(sum(CASE WHEN ok_words AND ok_mean AND ok_sym AND ok_alpha AND ok_stop
         |     AND ok_bullet AND ok_ellipsis THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
         | CAST(sum(CASE WHEN NOT ok_words THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_words,
         | CAST(sum(CASE WHEN NOT ok_mean THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_mean_len,
         | CAST(sum(CASE WHEN NOT ok_sym THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_symbols,
         | CAST(sum(CASE WHEN NOT ok_alpha THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_alpha,
         | CAST(sum(CASE WHEN NOT ok_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_stop
         |FROM qf GROUP BY source ORDER BY source""".stripMargin,

    "d42_gopher_repetition" -> d42Oracle,

    "d45_pretrain_pipeline" -> d45Oracle,

    // Mirrors tokenization, the (count desc, term asc) top-15
    // vocabulary cut, and the per-doc coverage ratio.
    "d49_vocab_coverage" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ')) AS w
        |  FROM documents),
        |t AS (SELECT doc_id, w FROM tok WHERE length(w) > 0),
        |v AS (SELECT w FROM (SELECT w, count(*) AS c FROM t GROUP BY 1
        |       ORDER BY c DESC, w LIMIT 15)),
        |j AS (SELECT t.doc_id, (v.w IS NOT NULL) AS inv
        |  FROM t LEFT JOIN v ON t.w = v.w)
        |SELECT doc_id, count(*) AS n_tokens,
        | CAST(sum(CASE WHEN inv THEN 1 ELSE 0 END) AS BIGINT) AS n_in_vocab,
        | round(sum(CASE WHEN inv THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS coverage
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Mirrors d23's md5-keyed centroids + argmax-cosine assignment
    // (keeping the winning cosine), then the from-sums cluster moments
    // and the z formula — the whole QA pipeline is hash-checked.
    "d53_embed_outliers" ->
      """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |k0 AS (SELECT vec_id AS kid, v AS cvec,
        |   CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)),1,15) AS BIGINT) AS hk
        |  FROM c ORDER BY hk, kid LIMIT 8),
        |cents AS (SELECT CAST(row_number() OVER (ORDER BY hk, kid) AS INT) AS list_id, cvec FROM k0),
        |a AS (SELECT cid, list_id, cos FROM (
        |  SELECT cc.vec_id AS cid, k.list_id,
        |    list_inner_product(cc.v,k.cvec)/(sqrt(list_inner_product(cc.v,cc.v))*sqrt(list_inner_product(k.cvec,k.cvec))) AS cos,
        |    row_number() OVER (PARTITION BY cc.vec_id ORDER BY
        |      list_inner_product(cc.v,k.cvec)/(sqrt(list_inner_product(cc.v,cc.v))*sqrt(list_inner_product(k.cvec,k.cvec))) DESC,
        |      k.list_id) AS rn
        |  FROM c cc, cents k) WHERE rn = 1),
        |st AS (SELECT list_id, count(*) AS n, sum(cos) AS s1, sum(cos*cos) AS s2 FROM a GROUP BY 1),
        |m AS (SELECT list_id, s1/n AS mean, sqrt(greatest(s2/n - (s1/n)*(s1/n), 0.0)) AS std FROM st)
        |SELECT a.cid AS vec_id, a.list_id, round(a.cos,4) AS cos,
        | round(CASE WHEN m.std > 0 THEN (a.cos - m.mean)/m.std ELSE 0.0 END, 4) AS z
        |FROM a JOIN m USING (list_id) ORDER BY vec_id""".stripMargin,

    // Full Okapi BM25 replay: same tokenization as d16, dl from the
    // per-doc token count, avgdl over ALL documents (empty docs as 0),
    // distinct query terms, k1=1.2, b=0.75, top-5 by (score desc, doc).
    "d54_bm25_retrieval" ->
      """WITH q(query_id, query_text) AS (VALUES
        |  (CAST(1 AS BIGINT), 'spark sort merge'),
        |  (CAST(2 AS BIGINT), 'stream window value'),
        |  (CAST(3 AS BIGINT), 'filter scan column')),
        |toks AS (SELECT doc_id, unnest(string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> '' GROUP BY 1,2),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks WHERE term <> '' GROUP BY 1),
        |dfx AS (SELECT term, count(*) AS df_t FROM tf GROUP BY 1),
        |stats AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
        |  (SELECT avg(coalesce(dl.dl, 0)) FROM documents d LEFT JOIN dl ON d.doc_id = dl.doc_id) AS avgdl),
        |qt AS (SELECT DISTINCT query_id, unnest(string_split(regexp_replace(lower(trim(query_text)),'\s+',' ','g'), ' ')) AS term FROM q),
        |scored AS (SELECT qt.query_id, tf.doc_id,
        |   sum(ln(1.0 + (stats.n_docs - dfx.df_t + 0.5)/(dfx.df_t + 0.5))
        |     * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))) AS score
        |  FROM qt JOIN tf USING (term) JOIN dfx USING (term)
        |   JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
        |  GROUP BY 1, 2),
        |r AS (SELECT query_id, doc_id, score,
        |   row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
        |  FROM scored)
        |SELECT query_id, doc_id, round(score, 4) AS score, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // Mirrors the d7 score arithmetic, the fixed-width binning, the
    // dense slice×bin grid, PSI's two-sided smoothing, and chi-square's
    // unsmoothed expectation.
    "d52_quality_drift" ->
      """WITH t0 AS (SELECT source, length(text) AS nc,
        |   len(string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ')) AS nw,
        |   length(regexp_replace(text, '[^.!?,;]', '', 'g')) AS np,
        |   length(regexp_replace(text, '[^A-Z]', '', 'g')) AS nu
        |  FROM documents),
        |t AS (SELECT source, least(1.0, nw/100.0)*0.5 + (1 - least(CAST(np AS DOUBLE)/nc, 1.0))*0.3
        |     + (1 - least(CAST(nu AS DOUBLE)/nc, 1.0))*0.2 AS v FROM t0),
        |b AS (SELECT source, least(9, greatest(0, CAST(floor(v/0.1) AS INT))) AS bin FROM t),
        |cells AS (SELECT source, bin, count(*) AS c FROM b GROUP BY 1,2),
        |st AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM cells GROUP BY 1),
        |gb AS (SELECT bin, CAST(sum(c) AS BIGINT) AS c_g FROM cells GROUP BY 1),
        |g AS (SELECT CAST(sum(c_g) AS BIGINT) AS n_g FROM gb),
        |grid AS (SELECT st.source, st.n_s, gb.bin, gb.c_g, coalesce(cells.c, 0) AS c
        |  FROM st CROSS JOIN gb LEFT JOIN cells ON cells.source = st.source AND cells.bin = gb.bin),
        |x AS (SELECT source, n_s, c, c_g,
        |   (c + 0.5) / (n_s + 5.0) AS p, (c_g + 0.5) / ((SELECT n_g FROM g) + 5.0) AS q,
        |   CAST(c_g AS DOUBLE) / (SELECT n_g FROM g) AS qe FROM grid)
        |SELECT source AS slice, max(n_s) AS n,
        | round(sum((p - q) * ln(p / q)), 6) AS psi,
        | round(sum(CASE WHEN c_g > 0 THEN pow(c - n_s * qe, 2) / (n_s * qe) ELSE 0 END), 4) AS chi2
        |FROM x GROUP BY 1 ORDER BY slice""".stripMargin,

    // Brute-force all-pairs ≤2-Hamming ground truth over the mirrored
    // hash construction — verifies the band join misses nothing.
    "d51_phash_neardup" ->
      """WITH h AS (SELECT doc_id AS id,
        |  xor(CAST('0x' || substr(md5(CAST(doc_id % 37 AS VARCHAR)), 1, 15) AS BIGINT),
        |      CAST(pow(2, doc_id % 11) AS BIGINT)) AS h
        | FROM documents),
        |p AS (SELECT a.id AS id_a, b.id AS id_b, bit_count(xor(a.h, b.h)) AS hamming
        |  FROM h a JOIN h b ON a.id < b.id
        |  WHERE bit_count(xor(a.h, b.h)) <= 2)
        |SELECT hamming, count(*) AS n_pairs,
        | CAST(sum(id_a) AS BIGINT) AS sum_a, CAST(sum(id_b) AS BIGINT) AS sum_b
        |FROM p GROUP BY 1 ORDER BY hamming""".stripMargin,

    // Mirrors the token counts, deterministic (count desc, term) rank
    // order, and the identical from-sums regression formulas; ln = ln.
    "d50_zipf_fit" ->
      """WITH tok AS (SELECT unnest(string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ')) AS w
        |  FROM documents),
        |cnt AS (SELECT w, count(*) AS c FROM tok WHERE length(w) > 0
        |        GROUP BY 1 ORDER BY c DESC, w LIMIT 100),
        |rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, w) AS r FROM cnt),
        |tot AS (SELECT CAST(sum(len(string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' '))) AS DOUBLE) AS nt
        |        FROM documents),
        |p AS (SELECT c, ln(CAST(r AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y FROM rk),
        |s AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
        |       sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy,
        |       CAST(sum(c) AS DOUBLE) AS sc FROM p)
        |SELECT CAST(n AS BIGINT) AS n_terms,
        | round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
        | round((sy*sxx - sx*sxy) / (n*sxx - sx*sx), 6) AS intercept,
        | round(pow(n*sxy - sx*sy, 2) / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS r2,
        | round(sc / nt, 6) AS head_share
        |FROM s, tot""".stripMargin,

    // Same bigram stream, symmetric pooled weights, minCount floor, and
    // 5 mechanically-unrolled power-iteration rounds (the c23 pattern).
    "d90_textrank" -> {
      val rounds = (1 to 5).map { i =>
        s"""r$i AS (SELECT v.w, 0.15 + 0.85 * coalesce(s.s, 0) AS rank FROM v LEFT JOIN (
           |    SELECT tr.dst AS w, sum(r${i - 1}.rank * tr.p) AS s
           |    FROM r${i - 1} JOIN tr ON r${i - 1}.w = tr.src GROUP BY 1) s USING (w))""".stripMargin
      }.mkString(",\n")
      s"""WITH toks AS (SELECT list_filter(string_split(
         |      regexp_replace(lower(trim(text)),'\\s+',' ','g'), ' '),
         |      w -> length(w) > 0) AS t
         |  FROM documents WHERE text IS NOT NULL),
         |bi AS (SELECT t[i] AS w1, t[i+1] AS w2
         |  FROM toks, UNNEST(range(1, len(t))) AS u(i) WHERE len(t) >= 2),
         |bd AS (SELECT w1, w2 FROM bi WHERE w1 <> w2),
         |sym AS (SELECT w1, w2 FROM bd UNION ALL SELECT w2, w1 FROM bd),
         |e AS (SELECT w1 AS src, w2 AS dst, count(*) AS w FROM sym
         |  GROUP BY 1, 2 HAVING count(*) >= 5),
         |ow AS (SELECT src, sum(w) AS ow FROM e GROUP BY 1),
         |tr AS (SELECT e.src, e.dst, e.w * 1.0 / ow.ow AS p FROM e JOIN ow USING (src)),
         |v AS (SELECT DISTINCT src AS w FROM tr),
         |r0 AS (SELECT w, 1.0 AS rank FROM v),
         |$rounds
         |SELECT w AS token, round(rank, 6) AS rank FROM r5 ORDER BY token""".stripMargin
    },

    // Same grid, same prefix sums, same minimax identity.
    "d89_isotonic" ->
      """WITH s AS (SELECT least(CAST(floor(n_chars / 600.0 * 16) AS INT), 15) AS b,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents
        |  WHERE text IS NOT NULL AND n_chars / 600.0 >= 0 AND n_chars / 600.0 <= 1),
        |bins AS (SELECT b, count(*) AS n, sum(y) AS sy FROM s GROUP BY 1),
        |c AS (SELECT b, n, sy, sum(n) OVER w AS cn, sum(sy) OVER w AS cs FROM bins
        |  WINDOW w AS (ORDER BY b ROWS UNBOUNDED PRECEDING)),
        |p AS (SELECT j.b AS j, k.b AS k,
        |    (k.cs - j.cs + j.sy) * 1.0 / (k.cn - j.cn + j.n) AS a
        |  FROM c j JOIN c k ON j.b <= k.b),
        |m AS (SELECT j, k, min(a) OVER
        |    (PARTITION BY j ORDER BY k DESC ROWS UNBOUNDED PRECEDING) AS mn FROM p),
        |iso AS (SELECT k AS b, max(mn) AS cal FROM m GROUP BY 1)
        |SELECT bins.b AS bin, CAST(bins.n AS BIGINT) AS n,
        | round(bins.sy * 1.0 / bins.n, 6) AS raw_rate,
        | round(iso.cal, 6) AS calibrated
        |FROM bins JOIN iso ON bins.b = iso.b ORDER BY bin""".stripMargin,

    // Same (doc, term) collapse, same closed-form variance over N.
    "d88_burstiness" ->
      """WITH toks AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS t
        |  FROM documents WHERE text IS NOT NULL),
        |dt AS (SELECT doc_id, tok AS token, count(*) AS c
        |  FROM toks, UNNEST(t) AS u(tok) WHERE length(tok) > 0 GROUP BY 1, 2),
        |n AS (SELECT count(*) AS nd FROM documents WHERE text IS NOT NULL),
        |a AS (SELECT token, count(*) AS df, sum(c) AS total, sum(c * c) AS sq
        |  FROM dt GROUP BY 1)
        |SELECT token, CAST(df AS BIGINT) AS df, CAST(total AS BIGINT) AS total,
        | round((sq / nd - (total * 1.0 / nd) * (total * 1.0 / nd)) /
        |   nullif(total * 1.0 / nd, 0), 6) AS vmr
        |FROM a, n WHERE total >= 10 ORDER BY token""".stripMargin,

    // Same tokenizer, same conditional counts, prior, delta and z.
    "d87_log_odds" ->
      """WITH toks AS (SELECT source, string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS t
        |  FROM documents WHERE text IS NOT NULL),
        |f AS (SELECT source IN ('src0','src1') AS tgt, tok AS token
        |  FROM toks, UNNEST(t) AS u(tok) WHERE length(tok) > 0),
        |c AS (SELECT token,
        |    sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS y_a,
        |    sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS y_b
        |  FROM f GROUP BY 1),
        |t AS (SELECT sum(y_a) AS na, sum(y_b) AS nb FROM c),
        |s AS (SELECT token, y_a, y_b,
        |    200.0 * (y_a + y_b) / (na + nb) AS aw, na, nb FROM c, t),
        |d AS (SELECT token, y_a, y_b,
        |    ln((y_a + aw) / nullif(na + 200.0 - y_a - aw, 0)) -
        |    ln((y_b + aw) / nullif(nb + 200.0 - y_b - aw, 0)) AS delta,
        |    aw FROM s)
        |SELECT token, CAST(y_a AS BIGINT) AS y_a, CAST(y_b AS BIGINT) AS y_b,
        | round(delta, 6) AS delta,
        | round(delta / sqrt(1.0 / (y_a + aw) + 1.0 / (y_b + aw)), 6) AS z
        |FROM d ORDER BY token""".stripMargin,

    // Same tokenizer, same bigram-stream sample space, same log
    // decomposition.
    "d86_collocations" ->
      """WITH toks AS (SELECT list_filter(string_split(
        |      regexp_replace(lower(trim(text)),'\s+',' ','g'), ' '),
        |      w -> length(w) > 0) AS t
        |  FROM documents WHERE text IS NOT NULL),
        |bi AS (SELECT t[i] AS w1, t[i+1] AS w2
        |  FROM toks, UNNEST(range(1, len(t))) AS u(i) WHERE len(t) >= 2),
        |big AS (SELECT w1, w2, count(*) AS cnt FROM bi GROUP BY 1, 2),
        |c1 AS (SELECT w1, sum(cnt) AS c1 FROM big GROUP BY 1),
        |c2 AS (SELECT w2, sum(cnt) AS c2 FROM big GROUP BY 1),
        |t AS (SELECT sum(cnt) AS nb FROM big)
        |SELECT big.w1, big.w2, CAST(cnt AS BIGINT) AS cnt,
        | round(ln(cnt) + ln(nb) - ln(c1.c1) - ln(c2.c2), 6) AS pmi
        |FROM big JOIN c1 USING (w1) JOIN c2 USING (w2), t
        |WHERE cnt >= 5 ORDER BY w1, w2""".stripMargin,

    // Same deletion-key formula (i=0..len covers the term itself), same
    // df cap on distinct-term neighborhoods, same exact verify.
    "d85_spell_variants" ->
      """WITH v AS (SELECT DISTINCT lower(trim(c_name)) AS w FROM customer
        |  WHERE c_name IS NOT NULL AND length(trim(c_name)) >= 4),
        |kd AS (SELECT DISTINCT w,
        |    substr(w, 1, i) || substr(w, i + 2, length(w)) AS key
        |  FROM v, UNNEST(range(0, length(w) + 1)) AS r(i)),
        |kf AS (SELECT key FROM kd GROUP BY key HAVING count(*) <= 100),
        |p AS (SELECT DISTINCT x.w AS a, y.w AS b
        |  FROM kd x JOIN kf ON x.key = kf.key JOIN kd y ON y.key = kf.key
        |  WHERE x.w < y.w)
        |SELECT a, b, CAST(levenshtein(a, b) AS INT) AS dist FROM p
        |WHERE levenshtein(a, b) <= 1 ORDER BY a, b""".stripMargin,

    // Same tokenizer, same first-seen/cumulate/regress pipeline.
    "d84_heaps_fit" ->
      """WITH d AS (SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |pd AS (SELECT doc_id, len(list_filter(toks, w -> length(w) > 0)) AS n FROM d),
        |fs AS (SELECT w, min(doc_id) AS fd
        |  FROM (SELECT doc_id, unnest(toks) AS w FROM d)
        |  WHERE length(w) > 0 GROUP BY 1),
        |nv AS (SELECT fd AS doc_id, count(*) AS nw FROM fs GROUP BY 1),
        |j AS (SELECT pd.doc_id, pd.n, coalesce(nv.nw, 0) AS nw
        |  FROM pd LEFT JOIN nv USING (doc_id)),
        |c AS (SELECT doc_id, n, sum(n) OVER w AS cn, sum(nw) OVER w AS cv FROM j
        |  WINDOW w AS (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)),
        |p AS (SELECT ln(CAST(cn AS DOUBLE)) AS x, ln(CAST(cv AS DOUBLE)) AS y, cn, cv
        |  FROM c WHERE n > 0 AND cn > 0 AND cv > 0),
        |s AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy,
        |    max(cn) AS nt, max(cv) AS nvx FROM p)
        |SELECT CAST(n AS BIGINT) AS n_docs, CAST(nt AS BIGINT) AS total_tokens,
        | CAST(nvx AS BIGINT) AS vocab,
        | round((n*sxy - sx*sy) / nullif(n*sxx - sx*sx, 0), 6) AS beta,
        | round(exp((sy*sxx - sx*sxy) / nullif(n*sxx - sx*sx, 0)), 6) AS k,
        | round(pow(n*sxy - sx*sy, 2)
        |   / nullif((n*sxx - sx*sx) * (n*syy - sy*sy), 0), 6) AS r2
        |FROM s""".stripMargin,

    // Mirrors the synthesized code-switch, the d8 per-line language
    // argmax, and the lag/cumsum run grouping.
    "d48_lang_segments" ->
      """WITH raw AS (SELECT doc_id,
        |   text || chr(10) || 'der und das ist ein test nicht zu' || chr(10) || text AS t2
        |  FROM documents),
        |l0 AS (SELECT doc_id, i - 1 AS line_no, arr[i] AS line
        |  FROM (SELECT doc_id, string_split(t2, chr(10)) AS arr FROM raw),
        |  UNNEST(range(1, len(arr) + 1)) AS u(i)
        |  WHERE length(trim(arr[i])) > 0),
        |w AS (SELECT doc_id, line_no,
        |   string_split(regexp_replace(lower(trim(line)),'\s+',' ','g'), ' ') AS w FROM l0),
        |h AS (SELECT doc_id, line_no,
        |  len(list_filter(w, x -> x IN ('the','a','of','to','and','is','in','it'))) AS h_en,
        |  len(list_filter(w, x -> x IN ('der','die','das','und','ist','ein','nicht','zu'))) AS h_de,
        |  len(list_filter(w, x -> x IN ('el','la','de','los','que','y','un','es'))) AS h_es,
        |  len(list_filter(w, x -> x IN ('le','la','les','et','est','un','dans','que'))) AS h_fr
        | FROM w),
        |p AS (SELECT doc_id, line_no, CASE
        |  WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr THEN 'en'
        |  WHEN h_de >= h_es AND h_de >= h_fr THEN 'de'
        |  WHEN h_es >= h_fr THEN 'es' ELSE 'fr' END AS lang FROM h),
        |m AS (SELECT doc_id, line_no, lang,
        |  CASE WHEN lang IS DISTINCT FROM lag(lang) OVER (PARTITION BY doc_id ORDER BY line_no)
        |       THEN 1 ELSE 0 END AS newseg FROM p),
        |s AS (SELECT doc_id, line_no, lang,
        |  SUM(newseg) OVER (PARTITION BY doc_id ORDER BY line_no ROWS UNBOUNDED PRECEDING) - 1 AS seg_no
        |  FROM m)
        |SELECT doc_id, CAST(seg_no AS BIGINT) AS seg_no, min(lang) AS lang,
        | count(*) AS n_lines, CAST(min(line_no) AS BIGINT) AS start_line
        |FROM s GROUP BY doc_id, seg_no ORDER BY doc_id, seg_no""".stripMargin,

    // Mirrors the keep rule exactly: alnum words of the lowercased
    // line, stopword ratio with the same double arithmetic, the
    // 200-char long-line override, newline reassembly in order.
    "d47_boilerplate_lines" ->
      """WITH t AS (SELECT doc_id,
        |   list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
        |     x -> length(x) > 0) AS lines FROM documents),
        |k AS (SELECT doc_id, lines,
        |   list_filter(lines, l -> (
        |     len(list_filter(string_split_regex(lower(l), '\s+'), w -> regexp_matches(w, '[a-z0-9]'))) >= 4
        |     AND len(list_filter(list_filter(string_split_regex(lower(l), '\s+'), w -> regexp_matches(w, '[a-z0-9]')),
        |           w -> w IN ('the','be','to','of','and','that','have','with'))) * 1.0
        |         >= 0.08 * len(list_filter(string_split_regex(lower(l), '\s+'), w -> regexp_matches(w, '[a-z0-9]')))
        |     ) OR length(l) >= 200) AS kept
        |  FROM t)
        |SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
        | CAST(len(kept) AS BIGINT) AS n_kept,
        | md5(coalesce(array_to_string(kept, chr(10)), '')) AS clean_md5
        |FROM k ORDER BY doc_id""".stripMargin,

    // Mirrors the documented heuristics: sentence split on [.!?]+ runs,
    // words = normalized tokens with an alphanumeric, syllables =
    // vowel groups floored at 1; same association order in the index
    // arithmetic.
    "d46_readability" ->
      """WITH t AS (SELECT doc_id,
        |   list_filter(string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' '),
        |     w -> regexp_matches(w, '[a-z0-9]')) AS toks,
        |   greatest(len(list_filter(list_transform(string_split_regex(text, '[.!?]+'), x -> trim(x)),
        |     x -> length(x) > 0)), 1) AS ns
        |  FROM documents),
        |m AS (SELECT doc_id, ns,
        |   len(toks) AS nw,
        |   coalesce(list_aggregate(list_transform(toks,
        |     w -> greatest(len(regexp_extract_all(w, '[aeiouy]+')), 1)), 'sum'), 0) AS syl
        |  FROM t)
        |SELECT doc_id, CAST(ns AS BIGINT) AS n_sentences, CAST(nw AS BIGINT) AS n_words,
        | CAST(syl AS BIGINT) AS n_syllables,
        | CASE WHEN nw > 0 THEN round(206.835 - 1.015 * (nw * 1.0 / ns) - 84.6 * (syl * 1.0 / nw), 4)
        |      ELSE 0.0 END AS reading_ease,
        | CASE WHEN nw > 0 THEN round(0.39 * (nw * 1.0 / ns) + 11.8 * (syl * 1.0 / nw) - 15.59, 4)
        |      ELSE 0.0 END AS fk_grade
        |FROM m ORDER BY doc_id""".stripMargin,

    // Keep-first = lexicographic min (doc_id, pos) per fingerprint,
    // computed as two chained mins (min doc, then min pos within it) —
    // the same winner Spark's min(struct) elects. Reassembly mirrors
    // the "\n\n" join ordered by original position.
    "d43_paragraph_dedup" ->
      """WITH ps AS (SELECT doc_id, string_split_regex(text, '\n{2,}') AS arr FROM documents),
        |p AS (SELECT doc_id, i - 1 AS pos, arr[i] AS para,
        |    md5(regexp_replace(lower(trim(arr[i])), '\s+', ' ', 'g')) AS fp
        |  FROM ps, UNNEST(range(1, len(arr) + 1)) AS u(i)
        |  WHERE length(trim(arr[i])) > 0),
        |w1 AS (SELECT fp, min(doc_id) AS d0 FROM p GROUP BY 1),
        |w2 AS (SELECT p.fp, min(p.pos) AS p0 FROM p JOIN w1 ON p.fp = w1.fp AND p.doc_id = w1.d0 GROUP BY 1),
        |k AS (SELECT p.doc_id, p.pos, p.para, (p.doc_id = w1.d0 AND p.pos = w2.p0) AS keep
        |  FROM p JOIN w1 ON p.fp = w1.fp JOIN w2 ON p.fp = w2.fp)
        |SELECT doc_id, count(*) AS n_paras,
        | CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        | md5(coalesce(string_agg(para, chr(10)||chr(10) ORDER BY pos) FILTER (WHERE keep), '')) AS clean_md5
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Recomputes the whole DSIR pipeline: md5 feature buckets
    // (unigrams + successor bigrams), add-1-smoothed target/raw bucket
    // distributions, λ join-back, per-doc log-weight sum, and the same
    // hash-derived Gumbel key with the same top-50 cut.
    "d44_dsir_resample" ->
      """WITH toks AS (SELECT doc_id, source,
        |   string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS t FROM documents),
        |f AS (SELECT doc_id, source, CAST('0x' || substr(md5(tok),1,15) AS BIGINT) % 512 AS b
        |      FROM toks, UNNEST(t) AS u(tok)
        |      UNION ALL
        |      SELECT doc_id, source, CAST('0x' || substr(md5(t[i] || ' ' || t[i+1]),1,15) AS BIGINT) % 512 AS b
        |      FROM toks, UNNEST(range(1, len(t))) AS u(i)),
        |tc AS (SELECT b, count(*) AS c FROM f WHERE source IN ('src0','src1') GROUP BY 1),
        |tt AS (SELECT count(*) AS n FROM f WHERE source IN ('src0','src1')),
        |rc AS (SELECT b, count(*) AS c FROM f GROUP BY 1),
        |rt AS (SELECT count(*) AS n FROM f),
        |lam AS (SELECT r.b,
        |    ln((coalesce(t.c, 0) + 1.0) / (tt.n + 512)) - ln((r.c + 1.0) / (rt.n + 512)) AS l
        |  FROM rc r LEFT JOIN tc t ON r.b = t.b, tt, rt),
        |sc AS (SELECT f.doc_id, sum(lam.l) AS lw FROM f JOIN lam ON f.b = lam.b GROUP BY 1),
        |g AS (SELECT doc_id, lw,
        |    lw + -ln(-ln((CAST('0x' || substr(md5(doc_id::VARCHAR),1,15) AS BIGINT) % 1000000 + 0.5) / 1000000.0)) AS key
        |  FROM sc),
        |top AS (SELECT doc_id, lw FROM g ORDER BY key DESC, doc_id LIMIT 50)
        |SELECT doc_id, round(lw, 4) AS log_weight FROM top ORDER BY doc_id""".stripMargin,

    // Greedy leftmost non-overlapping symbol merge ≡ global string
    // replace over the unit-separator (chr 31) joined chars: replace()
    // scans left and restarts AFTER each replacement, exactly one BPE
    // round's semantics; successive merges chain as successive
    // replaces. Separator-joined symbols (not raw chars) keep merges
    // from matching across unit boundaries.
    "d34b_bpe_encode" ->
      """WITH toks AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS t FROM documents),
        |w AS (SELECT doc_id, i, t[i] AS w FROM toks, UNNEST(range(1, len(t)+1)) AS u(i) WHERE len(t[i]) > 0),
        |s0 AS (SELECT doc_id, i, array_to_string(string_split_regex(w, ''), chr(31)) AS s FROM w),
        |r1 AS (SELECT doc_id, i, replace(s, 't'||chr(31)||'h', 'th') AS s FROM s0),
        |r2 AS (SELECT doc_id, i, replace(s, 'th'||chr(31)||'e', 'the') AS s FROM r1),
        |r3 AS (SELECT doc_id, i, replace(s, 'i'||chr(31)||'n', 'in') AS s FROM r2),
        |r4 AS (SELECT doc_id, i, replace(s, 'a'||chr(31)||'n', 'an') AS s FROM r3),
        |r5 AS (SELECT doc_id, i, replace(s, 'e'||chr(31)||'r', 'er') AS s FROM r4),
        |f AS (SELECT doc_id, flatten(array_agg(string_split(s, chr(31)) ORDER BY i)) AS us
        |      FROM r5 GROUP BY doc_id)
        |SELECT doc_id, CAST(len(us) AS BIGINT) AS n_bpe_tokens,
        | substr(md5(array_to_string(us, ' ')), 1, 8) AS units_md5
        |FROM f ORDER BY doc_id""".stripMargin,

    "d24_chunking" ->
      """WITH toks AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS t
        |       FROM documents WHERE length(trim(text)) > 0),
        |n AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
        |c AS (SELECT doc_id, t, n, greatest(1, CAST(ceil((n - 8) / 24.0) AS BIGINT)) AS n_chunks FROM n),
        |e AS (SELECT doc_id, t, n, CAST(unnest(range(n_chunks)) AS BIGINT) AS chunk_id FROM c),
        |s AS (SELECT doc_id, chunk_id, t[chunk_id*24 + 1 : least(chunk_id*24 + 32, n)] AS ct FROM e)
        |SELECT doc_id, chunk_id, CAST(len(ct) AS BIGINT) AS n_tokens,
        | substr(md5(array_to_string(ct, ' ')), 1, 8) AS chunk_md5
        |FROM s ORDER BY doc_id, chunk_id""".stripMargin,

    "d25_decontaminate" ->
      """WITH toks AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS t FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
        |       FROM toks, UNNEST(range(1, len(t)-1)) AS u(i)),
        |ev AS (SELECT DISTINCT g FROM sh0 WHERE doc_id % 50 = 0),
        |tr AS (SELECT doc_id, g FROM sh0 WHERE doc_id % 50 <> 0),
        |sz AS (SELECT doc_id, count(*) AS n_shingles FROM tr GROUP BY 1),
        |m AS (SELECT tr.doc_id, count(*) AS n_matched FROM tr JOIN ev USING (g) GROUP BY 1)
        |SELECT m.doc_id, sz.n_shingles, m.n_matched,
        | round(m.n_matched*1.0/sz.n_shingles, 4) AS overlap_ratio,
        | (m.n_matched*1.0/sz.n_shingles >= 0.5) AS contaminated
        |FROM m JOIN sz ON m.doc_id = sz.doc_id ORDER BY m.doc_id""".stripMargin,

    // Full IVF mirror: md5-keyed centroid sample → argmax-cosine list
    // assignment → top-4 probed lists per query → exact cosine within
    // probed lists → top-5. Same expressions as the Spark plan
    // (double-upcast vectors, dot/(norm·norm), ties to smaller
    // list_id/cid), so the APPROXIMATE result is reproduced exactly.
    "d23_ann_ivf" ->
      """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |k0 AS (SELECT vec_id AS kid, v AS cvec,
        |   CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)),1,15) AS BIGINT) AS hk
        |  FROM c ORDER BY hk, kid LIMIT 8),
        |cents AS (SELECT CAST(row_number() OVER (ORDER BY hk, kid) AS INT) AS list_id, cvec FROM k0),
        |assign AS (SELECT cid, list_id FROM (
        |  SELECT cc.vec_id AS cid, k.list_id,
        |    row_number() OVER (PARTITION BY cc.vec_id ORDER BY
        |      list_inner_product(cc.v,k.cvec)/(sqrt(list_inner_product(cc.v,cc.v))*sqrt(list_inner_product(k.cvec,k.cvec))) DESC,
        |      k.list_id) AS rn
        |  FROM c cc, cents k) WHERE rn = 1),
        |probes AS (SELECT qid, list_id FROM (
        |  SELECT q.vec_id AS qid, k.list_id,
        |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_inner_product(q.v,k.cvec)/(sqrt(list_inner_product(q.v,q.v))*sqrt(list_inner_product(k.cvec,k.cvec))) DESC,
        |      k.list_id) AS rn
        |  FROM c q, cents k WHERE q.vec_id < 10) WHERE rn <= 4),
        |s AS (SELECT p.qid, a.cid,
        |   list_inner_product(qv.v,cv.v)/(sqrt(list_inner_product(qv.v,qv.v))*sqrt(list_inner_product(cv.v,cv.v))) AS cos
        |  FROM probes p JOIN assign a USING (list_id)
        |  JOIN c qv ON qv.vec_id = p.qid JOIN c cv ON cv.vec_id = a.cid
        |  WHERE p.qid <> a.cid),
        |r AS (SELECT qid, cid, cos,
        |   CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS BIGINT) AS rank FROM s)
        |SELECT qid, cid, round(cos,4) AS cosine, rank FROM r WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    // Mirrors the ENTIRE two-level pipeline: 3 md5-keyed top cells →
    // per-vector top-cell argmax → per-cell 4× hash-threshold
    // oversample (floor() = Spark's positive-double cast-to-long) →
    // per-cell rank-3 sub-centroids with global list ids → corpus
    // assigned through its top-2 cells → queries probe 4 lists ranked
    // over ALL subs → exact cosine top-5. Every double is computed in
    // the same order as the Spark plan (raw-vector centroids, no
    // averaged floats), so the approximate result hash-matches.
    "d23b_ann_ivf_hier" ->
      """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |t0 AS (SELECT vec_id AS kid, v AS tvec,
        |   CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)),1,15) AS BIGINT) AS hk
        |  FROM c ORDER BY hk, kid LIMIT 3),
        |tops AS (SELECT CAST(row_number() OVER (ORDER BY hk, kid) AS INT) AS top_id, tvec FROM t0),
        |ta AS (SELECT cid, top_id FROM (
        |  SELECT cc.vec_id AS cid, t.top_id,
        |    row_number() OVER (PARTITION BY cc.vec_id ORDER BY
        |      list_inner_product(cc.v,t.tvec)/(sqrt(list_inner_product(cc.v,cc.v))*sqrt(list_inner_product(t.tvec,t.tvec))) DESC,
        |      t.top_id) AS rn
        |  FROM c cc, tops t) WHERE rn = 1),
        |th AS (SELECT cid, top_id,
        |   CAST('0x' || substr(md5(CAST(cid AS VARCHAR)),1,15) AS BIGINT) AS h FROM ta),
        |cnt AS (SELECT top_id, count(*) AS n FROM th GROUP BY 1),
        |surv AS (SELECT th.cid, th.top_id, th.h FROM th JOIN cnt USING (top_id)
        |  WHERE cnt.n <= 12
        |     OR th.h <= CAST(floor(1152921504606846976.0 * 4.0 * 3 / cnt.n) AS BIGINT)),
        |rk AS (SELECT cid, top_id, h,
        |   row_number() OVER (PARTITION BY top_id ORDER BY h, cid) AS r FROM surv),
        |subs AS (SELECT CAST(row_number() OVER (ORDER BY rk.top_id, rk.h, rk.cid) AS INT) AS list_id,
        |   rk.top_id, c.v AS cvec
        |  FROM rk JOIN c ON c.vec_id = rk.cid WHERE rk.r <= 3),
        |ha AS (SELECT cid, top_id FROM (
        |  SELECT cc.vec_id AS cid, t.top_id,
        |    row_number() OVER (PARTITION BY cc.vec_id ORDER BY
        |      list_inner_product(cc.v,t.tvec)/(sqrt(list_inner_product(cc.v,cc.v))*sqrt(list_inner_product(t.tvec,t.tvec))) DESC,
        |      t.top_id) AS rn
        |  FROM c cc, tops t) WHERE rn <= 2),
        |assign AS (SELECT cid, list_id FROM (
        |  SELECT ha.cid, s.list_id,
        |    row_number() OVER (PARTITION BY ha.cid ORDER BY
        |      list_inner_product(cv.v,s.cvec)/(sqrt(list_inner_product(cv.v,cv.v))*sqrt(list_inner_product(s.cvec,s.cvec))) DESC,
        |      s.list_id) AS rn
        |  FROM ha JOIN c cv ON cv.vec_id = ha.cid JOIN subs s ON s.top_id = ha.top_id) WHERE rn = 1),
        |probes AS (SELECT qid, list_id FROM (
        |  SELECT q.vec_id AS qid, s.list_id,
        |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_inner_product(q.v,s.cvec)/(sqrt(list_inner_product(q.v,q.v))*sqrt(list_inner_product(s.cvec,s.cvec))) DESC,
        |      s.list_id) AS rn
        |  FROM c q, subs s WHERE q.vec_id < 10) WHERE rn <= 4),
        |sc AS (SELECT p.qid, a.cid,
        |   list_inner_product(qv.v,cv.v)/(sqrt(list_inner_product(qv.v,qv.v))*sqrt(list_inner_product(cv.v,cv.v))) AS cos
        |  FROM probes p JOIN assign a USING (list_id)
        |  JOIN c qv ON qv.vec_id = p.qid JOIN c cv ON cv.vec_id = a.cid
        |  WHERE p.qid <> a.cid),
        |r AS (SELECT qid, cid, cos,
        |   CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS BIGINT) AS rank FROM sc)
        |SELECT qid, cid, round(cos,4) AS cosine, rank FROM r WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    // Mirrors the ENTIRE cluster-blocked pipeline (same centroid sample
    // + argmax assignment as d23), then the in-cluster pairwise ≥τ drop
    // rule — the approximate dedup decision itself is hash-checked.
    "d38_semantic_dedup" ->
      """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |k0 AS (SELECT vec_id AS kid, v AS cvec,
        |   CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)),1,15) AS BIGINT) AS hk
        |  FROM c ORDER BY hk, kid LIMIT 8),
        |cents AS (SELECT CAST(row_number() OVER (ORDER BY hk, kid) AS INT) AS list_id, cvec FROM k0),
        |assign AS (SELECT cid, list_id FROM (
        |  SELECT cc.vec_id AS cid, k.list_id,
        |    row_number() OVER (PARTITION BY cc.vec_id ORDER BY
        |      list_inner_product(cc.v,k.cvec)/(sqrt(list_inner_product(cc.v,cc.v))*sqrt(list_inner_product(k.cvec,k.cvec))) DESC,
        |      k.list_id) AS rn
        |  FROM c cc, cents k) WHERE rn = 1),
        |m AS (SELECT a.cid AS vid, a.list_id, c.v FROM assign a JOIN c ON c.vec_id = a.cid),
        |drp AS (SELECT DISTINCT b.vid AS vid
        |  FROM m a JOIN m b ON a.list_id = b.list_id AND a.vid < b.vid
        |  WHERE list_inner_product(a.v,b.v)/(sqrt(list_inner_product(a.v,a.v))*sqrt(list_inner_product(b.v,b.v))) >= 0.45)
        |SELECT m.vid AS vec_id, m.list_id, (drp.vid IS NULL) AS kept
        |FROM m LEFT JOIN drp USING (vid) ORDER BY vec_id""".stripMargin,

    "d5_ann_bruteforce" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |s AS (SELECT qid, cid,
        |   list_inner_product(qv,cv) / (sqrt(list_inner_product(qv,qv)) * sqrt(list_inner_product(cv,cv))) AS cos
        |  FROM q, c WHERE qid <> cid),
        |r AS (SELECT qid, cid, cos,
        |   CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS BIGINT) AS rank FROM s)
        |SELECT qid, cid, round(cos,4) AS cosine, rank FROM r WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    // LSH parameters are sized so recall is ~1 at this corpus's top-5
    // cosine floor (see the d6 query comment) — the oracle is exact
    // brute-force top-k, identical to d5's.
    "d6_ann_lsh" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |s AS (SELECT qid, cid,
        |   list_inner_product(qv,cv) / (sqrt(list_inner_product(qv,qv)) * sqrt(list_inner_product(cv,cv))) AS cos
        |  FROM q, c WHERE qid <> cid),
        |r AS (SELECT qid, cid, cos,
        |   CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS BIGINT) AS rank FROM s)
        |SELECT qid, cid, round(cos,4) AS cosine, rank FROM r WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "d7_text_quality" ->
      """WITH t AS (SELECT doc_id, text,
        |  length(text) AS nc,
        |  len(string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ')) AS nw,
        |  length(regexp_replace(text, '[^.!?,;]', '', 'g')) AS np,
        |  length(regexp_replace(text, '[^A-Z]', '', 'g')) AS nu,
        |  len(list_filter(string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' '),
        |      x -> x IN ('the','a','of','to','and','is','in','it'))) AS ns
        | FROM documents)
        |SELECT doc_id, CAST(nc AS BIGINT) AS n_chars, CAST(nw AS BIGINT) AS n_words,
        | round(CAST(nc AS DOUBLE)/nw, 4) AS avg_word_len,
        | round(CAST(np AS DOUBLE)/nc, 4) AS punct_ratio,
        | round(CAST(nu AS DOUBLE)/nc, 4) AS upper_ratio,
        | round(CAST(ns AS DOUBLE)/nw, 4) AS stopword_ratio,
        | round(least(1.0, nw/100.0)*0.5 + (1 - least(CAST(np AS DOUBLE)/nc, 1.0))*0.3
        |     + (1 - least(CAST(nu AS DOUBLE)/nc, 1.0))*0.2, 4) AS quality
        |FROM t ORDER BY doc_id""".stripMargin,

    "d8_lang_id" ->
      """WITH t AS (SELECT lang, string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS w FROM documents),
        |h AS (SELECT lang,
        |  len(list_filter(w, x -> x IN ('the','a','of','to','and','is','in','it'))) AS h_en,
        |  len(list_filter(w, x -> x IN ('der','die','das','und','ist','ein','nicht','zu'))) AS h_de,
        |  len(list_filter(w, x -> x IN ('el','la','de','los','que','y','un','es'))) AS h_es,
        |  len(list_filter(w, x -> x IN ('le','la','les','et','est','un','dans','que'))) AS h_fr
        | FROM t),
        |p AS (SELECT lang, CASE
        |  WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr THEN 'en'
        |  WHEN h_de >= h_es AND h_de >= h_fr THEN 'de'
        |  WHEN h_es >= h_fr THEN 'es' ELSE 'fr' END AS pred_lang FROM h)
        |SELECT pred_lang, lang, count(*) AS n
        |FROM p GROUP BY 1,2 ORDER BY pred_lang, lang""".stripMargin,

    "d9_token_count" ->
      """SELECT source, count(*) AS n_docs,
        | CAST(sum(len(string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' '))) AS BIGINT) AS ws_tokens,
        | CAST(sum(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))) AS BIGINT) AS re_tokens,
        | round(avg(len(string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' '))),4) AS avg_ws_tokens
        |FROM documents GROUP BY 1 ORDER BY source""".stripMargin,

    "d10_fingerprint" ->
      """WITH s AS (SELECT doc_id, regexp_replace(lower(trim(text)),'\s+',' ','g') AS norm FROM documents),
        |w AS (SELECT doc_id, norm, string_split(norm,' ') AS t FROM s)
        |SELECT doc_id, md5(norm) AS content_md5,
        | CASE WHEN len(t) >= 3 THEN
        |   list_min(list_transform(range(1, len(t)-1), i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2])))
        | END AS min_shingle_md5
        |FROM w ORDER BY doc_id""".stripMargin,

    "d11_vector_stats" ->
      """WITH v AS (SELECT CAST(label AS BIGINT) AS label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
        |SELECT label, count(*) AS n,
        | round(avg(sqrt(list_inner_product(e, e))),4) AS avg_norm,
        | round(avg(e[1]),4) AS avg_dim1, round(avg(e[2]),4) AS avg_dim2
        |FROM v GROUP BY 1 ORDER BY label""".stripMargin,

    // Same quantization arithmetic step for step: scale = max|v|/127,
    // q = clamp(round(v/scale)) (round half away from zero in both
    // engines), error = max|v - q*scale|.
    "d29_quantize" ->
      """WITH v AS (SELECT CAST(label AS BIGINT) AS label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |s AS (SELECT label, e, list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale FROM v),
        |q AS (SELECT label, e, scale,
        |   CASE WHEN scale > 0
        |        THEN list_transform(e, x -> CAST(greatest(-127, least(127, round(x/scale))) AS INT))
        |        ELSE list_transform(e, x -> 0) END AS qv
        |  FROM s),
        |err AS (SELECT label, scale,
        |   list_max(list_transform(range(1, len(e)+1), i -> abs(e[i] - qv[i]*scale))) AS merr
        |  FROM q)
        |SELECT label, count(*) AS n, round(avg(scale),4) AS avg_scale,
        | round(avg(merr),4) AS avg_max_err, round(max(merr),4) AS worst_err
        |FROM err GROUP BY 1 ORDER BY label""".stripMargin,

    // LSH parameters sized for recall ~1 at τ=0.45 (see query comment) —
    // the oracle is the exact all-pairs formulation.
    "d12_embed_neardup" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |p AS (SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
        |   list_inner_product(a.e,b.e) / (sqrt(list_inner_product(a.e,a.e)) * sqrt(list_inner_product(b.e,b.e))) AS cos
        |  FROM v a JOIN v b ON a.vec_id < b.vec_id)
        |SELECT doc_a, doc_b, round(cos,4) AS cosine
        |FROM p WHERE cos >= 0.45 ORDER BY doc_a, doc_b""".stripMargin,

    "d13_multimodal" ->
      """SELECT source, 'text/plain' AS media_type, count(*) AS n,
        | CAST(sum(strlen(text)) AS BIGINT) AS sum_bytes,
        | count(DISTINCT sha256(text)) AS n_checksums
        |FROM documents GROUP BY 1,2 ORDER BY source""".stripMargin,

    "d14_sample" ->
      """WITH b AS (SELECT lang, text,
        |  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000 AS bucket
        | FROM documents)
        |SELECT lang, count(*) AS n_kept, CAST(sum(length(text)) AS BIGINT) AS sum_chars
        |FROM b
        |WHERE bucket < (CASE WHEN lang = 'en' THEN 250000
        |                     WHEN lang = 'de' THEN 1000000 ELSE 100000 END)
        |GROUP BY 1 ORDER BY lang""".stripMargin,

    "d30_sample_k" ->
      """WITH b AS (SELECT lang, doc_id,
        |  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000 AS bucket
        | FROM documents),
        |r AS (SELECT lang, doc_id,
        |  row_number() OVER (PARTITION BY lang ORDER BY bucket, doc_id) AS rn FROM b)
        |SELECT lang, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS sum_ids
        |FROM r WHERE rn <= 7 GROUP BY 1 ORDER BY lang""".stripMargin,

    "d15_dedup_clusters" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
        |       FROM toks, UNNEST(range(1, len(t)-1)) AS u(i)),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        |      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1,2),
        |dup AS (SELECT doc_a, doc_b FROM p JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
        |        WHERE inter*1.0/(x.n + y.n - inter) >= 0.5),
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM dup UNION SELECT doc_b, doc_a FROM dup),
        |reach(id, r) AS (SELECT src, src FROM e
        |  UNION SELECT reach.id, e.dst FROM reach JOIN e ON reach.r = e.src)
        |SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
        |FROM reach GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // d15's recursive-CTE clustering + the d17 token-count idiom; keep =
    // top-1 by (tokens DESC, doc_id ASC) within each cluster, singletons
    // (docs outside every pair) cluster with themselves.
    "d15b_canonical_keep" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
        |       FROM toks, UNNEST(range(1, len(t)-1)) AS u(i)),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        |      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1,2),
        |dup AS (SELECT doc_a, doc_b FROM p JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
        |        WHERE inter*1.0/(x.n + y.n - inter) >= 0.5),
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM dup UNION SELECT doc_b, doc_a FROM dup),
        |reach(id, r) AS (SELECT src, src FROM e
        |  UNION SELECT reach.id, e.dst FROM reach JOIN e ON reach.r = e.src)
        |, lab AS (SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id FROM reach GROUP BY 1),
        |q AS (SELECT doc_id, len(t) AS ntok FROM toks),
        |f AS (SELECT q.doc_id, COALESCE(lab.cluster_id, q.doc_id) AS cluster_id, q.ntok
        |      FROM q LEFT JOIN lab USING (doc_id)),
        |r AS (SELECT doc_id, cluster_id,
        |      row_number() OVER (PARTITION BY cluster_id ORDER BY ntok DESC, doc_id ASC) AS rn
        |      FROM f)
        |SELECT doc_id, cluster_id, (rn = 1) AS keep FROM r ORDER BY doc_id""".stripMargin,

    "d16_tfidf" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> '' GROUP BY 1,2),
        |dfx AS (SELECT term, count(*) AS df_t FROM tf GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
        |s AS (SELECT tf.doc_id, tf.term, tf.tf,
        |   tf.tf * (ln((n.n_docs + 1.0)/(dfx.df_t + 1.0)) + 1.0) AS score,
        |   row_number() OVER (PARTITION BY tf.doc_id
        |     ORDER BY tf.tf * (ln((n.n_docs + 1.0)/(dfx.df_t + 1.0)) + 1.0) DESC, tf.term) AS rnk
        |  FROM tf JOIN dfx USING (term) CROSS JOIN n)
        |SELECT doc_id, term, tf, round(score, 4) AS score
        |FROM s WHERE rnk <= 3 ORDER BY doc_id, term""".stripMargin,

    "d17_packing" ->
      """WITH t AS (SELECT doc_id, doc_id % 8 AS shard,
        |   len(string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ')) AS n_tokens
        | FROM documents),
        |c AS (SELECT doc_id, shard, n_tokens,
        |   sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        | FROM t),
        |p AS (SELECT shard, CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS pack_id, n_tokens FROM c)
        |SELECT shard, pack_id, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
        |FROM p GROUP BY 1,2 ORDER BY shard, pack_id""".stripMargin,

    // Same packing CTEs as d17, plus the in-pack inclusive running sum:
    // cu_seqlens = '0,' followed by the ordered in-pack cumsums.
    "d17b_pack_manifest" ->
      """WITH t AS (SELECT doc_id, doc_id % 8 AS shard,
        |   len(string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ')) AS n_tokens
        | FROM documents),
        |c AS (SELECT doc_id, shard, n_tokens,
        |   sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        | FROM t),
        |p AS (SELECT shard, CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS pack_id, doc_id, n_tokens FROM c),
        |q AS (SELECT shard, pack_id, doc_id, n_tokens,
        |   sum(n_tokens) OVER (PARTITION BY shard, pack_id ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS icum
        | FROM p)
        |SELECT shard, pack_id, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        | string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids_csv,
        | '0,' || string_agg(CAST(icum AS VARCHAR), ',' ORDER BY doc_id) AS cu_csv
        |FROM q GROUP BY 1,2 ORDER BY shard, pack_id""".stripMargin,

    "d20_redact" ->
      """WITH t AS (SELECT source,
        |  text || ' contact user' || CAST(doc_id AS VARCHAR)
        |   || '@example.com or https://site' || CAST(doc_id % 7 AS VARCHAR)
        |   || '.org/p call 555-12' || CAST(doc_id % 10 AS VARCHAR)
        |   || '-4567 from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1' AS t2
        | FROM documents),
        |r AS (SELECT source, t2,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(t2,
        |    'https?://[^ ]+', '<URL>', 'g'),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
        |    '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g') AS red
        | FROM t)
        |SELECT source, count(*) AS n_docs,
        | CAST(sum(len(regexp_extract_all(t2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT) AS n_emails,
        | CAST(sum(len(regexp_extract_all(t2, 'https?://[^ ]+'))) AS BIGINT) AS n_urls,
        | CAST(sum(len(regexp_extract_all(t2, '[0-9]{3}-[0-9]{3}-[0-9]{4}'))) AS BIGINT) AS n_phones,
        | CAST(sum(length(red) - length(t2)) AS BIGINT) AS sum_len_delta
        |FROM r GROUP BY 1 ORDER BY source""".stripMargin,

    "d19_quality_filter" ->
      """WITH t AS (SELECT doc_id, source,
        |  least(1.0, len(string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' '))/100.0)*0.5
        |  + (1 - least(CAST(length(regexp_replace(text,'[^.!?,;]','','g')) AS DOUBLE)/length(text), 1.0))*0.3
        |  + (1 - least(CAST(length(regexp_replace(text,'[^A-Z]','','g')) AS DOUBLE)/length(text), 1.0))*0.2 AS q
        | FROM documents),
        |r AS (SELECT source, q,
        |   percent_rank() OVER (PARTITION BY source ORDER BY q DESC, doc_id) AS pr FROM t)
        |SELECT source, count(*) AS n_kept, round(avg(q),4) AS avg_quality
        |FROM r WHERE pr <= 0.25 GROUP BY 1 ORDER BY source""".stripMargin,

    // The identical race: same md5 uniform, same -ln(u)/w key, same
    // (race, doc_id) order.
    "d74_weighted_sample" ->
      """WITH u AS (SELECT doc_id, lang, n_chars,
        |   ((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'wsk'), 1, 15) AS BIGINT)
        |      % 1000000) + 0.5) / 1000000.0 AS uu
        |  FROM documents WHERE n_chars > 0),
        |s AS (SELECT doc_id, lang, n_chars FROM u
        |      ORDER BY -ln(uu) / n_chars, doc_id LIMIT 50)
        |SELECT doc_id, lang, n_chars FROM s ORDER BY doc_id""".stripMargin,

    // The spectrum invariants recomputed from the raw population
    // covariance matrix: trace = Σ diag, frob2 = Σ cov² — equal to Σλ
    // and Σλ² iff the engine's covariance pass AND eigensolve are right.
    "d77_pca_spectrum" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |x AS (SELECT vec_id, CAST(u.d AS INT) AS d, v[CAST(u.d AS INT) + 1] AS val
        |      FROM e, UNNEST(range(64)) AS u(d)),
        |c AS (SELECT a.d AS i, b.d AS j, covar_pop(a.val, b.val) AS cv
        |      FROM x a JOIN x b ON a.vec_id = b.vec_id GROUP BY 1, 2)
        |SELECT (SELECT count(*) FROM e) AS n,
        |       round(sum(CASE WHEN i = j THEN cv ELSE 0 END), 4) AS trace,
        |       round(sum(cv * cv), 4) AS frob2
        |FROM c""".stripMargin,

    // Same cross-group scores, same deterministic top-k tie order,
    // same background averages and margin ratio.
    "d82_margin_pairs" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |a AS (SELECT vec_id AS a_id, v FROM e WHERE label = 0),
        |b AS (SELECT vec_id AS b_id, v FROM e WHERE label = 1),
        |s AS (SELECT a_id, b_id, list_cosine_similarity(a.v, b.v) AS cos FROM a, b),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY a_id ORDER BY cos DESC, b_id) AS ra,
        |    row_number() OVER (PARTITION BY b_id ORDER BY cos DESC, a_id) AS rb
        |  FROM s),
        |g AS (SELECT *,
        |    avg(CASE WHEN ra <= 4 THEN cos END) OVER (PARTITION BY a_id) AS bga,
        |    avg(CASE WHEN rb <= 4 THEN cos END) OVER (PARTITION BY b_id) AS bgb
        |  FROM r),
        |m AS (SELECT a_id, b_id, cos, cos / ((bga + bgb) / 2) AS margin
        |  FROM g WHERE (bga + bgb) / 2 > 0)
        |SELECT a_id, b_id, round(cos, 4) AS cosine, round(margin, 4) AS margin
        |FROM m WHERE margin >= 1.05 ORDER BY a_id, b_id""".stripMargin,

    // The oracle replays the plant and the full cross scan: only the
    // planted (q+100000, q) pairs clear the threshold, at cosine 1.
    "d81_semantic_contam" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |q AS (SELECT * FROM e WHERE vec_id < 25),
        |t AS (SELECT vec_id, v FROM e WHERE vec_id >= 25
        |      UNION ALL
        |      SELECT vec_id + 100000, list_transform(v, x -> x * 2.0) FROM q),
        |p AS (SELECT t.vec_id AS cid, q.vec_id AS eval_id,
        |    list_cosine_similarity(t.v, q.v) AS cos
        |  FROM t, q WHERE t.vec_id <> q.vec_id)
        |SELECT cid, eval_id, round(cos, 4) AS cosine
        |FROM p WHERE cos >= 0.95 ORDER BY eval_id""".stripMargin,

    // Same normalize/split/3-gram/distinct/md5-60 derivation; novelty
    // recomputed per doc then averaged per source.
    "d80_novelty" ->
      """WITH toks AS (SELECT doc_id, source,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |grams AS (SELECT DISTINCT doc_id, source,
        |    CAST('0x' || substr(md5(t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT)+1]
        |      || ' ' || t[CAST(i AS INT)+2]), 1, 15) AS BIGINT) AS g
        |  FROM toks, UNNEST(range(1, len(t) - 1)) u(i) WHERE len(t) >= 3),
        |ref AS (SELECT DISTINCT g FROM grams WHERE doc_id % 7 <> 0),
        |gen AS (SELECT doc_id, source, count(*) AS n_grams,
        |    CAST(sum(CASE WHEN r.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_seen
        |  FROM (SELECT * FROM grams WHERE doc_id % 7 = 0) x
        |  LEFT JOIN ref r USING (g) GROUP BY 1, 2)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_grams) AS BIGINT) AS grams, CAST(sum(n_seen) AS BIGINT) AS seen,
        |  round(avg(1.0 - n_seen / CAST(n_grams AS DOUBLE)), 4) AS avg_novelty
        |FROM gen GROUP BY 1 ORDER BY source""".stripMargin,

    // Rebuild the md5-seeded codebooks and replay encode: nearest
    // (squared-L2) seed per 8-dim subspace, ties to the lowest code.
    "d78_pq_encode" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |seed AS (SELECT v, row_number() OVER (ORDER BY h, id) - 1 AS code FROM (
        |    SELECT v, CAST(vec_id AS VARCHAR) AS id,
        |      CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |    FROM e) ORDER BY h, id LIMIT 16),
        |x AS (SELECT e.vec_id, CAST(t.j AS INT) AS j, CAST(t2.d AS INT) AS d,
        |       e.v[CAST(t.j AS INT) * 8 + CAST(t2.d AS INT) + 1] AS val
        |      FROM e, range(8) t(j), range(8) t2(d)),
        |sx AS (SELECT s.code, CAST(t.j AS INT) AS j, CAST(t2.d AS INT) AS d,
        |       s.v[CAST(t.j AS INT) * 8 + CAST(t2.d AS INT) + 1] AS cval
        |      FROM seed s, range(8) t(j), range(8) t2(d)),
        |dist AS (SELECT x.vec_id, x.j, sx.code, sum((x.val - sx.cval) * (x.val - sx.cval)) AS dd
        |      FROM x JOIN sx ON x.j = sx.j AND x.d = sx.d GROUP BY 1, 2, 3),
        |best AS (SELECT vec_id, j, code, dd FROM (
        |      SELECT *, row_number() OVER (PARTITION BY vec_id, j ORDER BY dd, code) AS rn
        |      FROM dist) WHERE rn = 1)
        |SELECT j, count(DISTINCT code) AS n_codes_used, round(avg(dd), 4) AS avg_err
        |FROM best GROUP BY 1 ORDER BY j""".stripMargin,

    // Same md5 parity, same planted signature, same \x{...} artifact
    // class (Java regex and RE2 parse it identically); the oracle
    // asserts the repair semantically — every eligible (corrupted,
    // ascii-clean) doc fixed, every clean ascii doc untouched.
    "d72_mojibake" ->
      """WITH d AS (SELECT source, text,
        |   (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'moji'), 1, 15) AS BIGINT)
        |      % 1000000) % 2 = 0 AS p,
        |   NOT regexp_matches(text, '[^\x00-\x7f]') AS a FROM documents),
        |c AS (SELECT source, p, a,
        |   CASE WHEN p THEN replace(text, 'a', 'Ã©') ELSE text END AS ct FROM d),
        |x AS (SELECT source, p, a,
        |   length(ct) - length(regexp_replace(ct,
        |     '[\x{00C2}\x{00C3}\x{FFFD}\x{0080}-\x{009F}]', '', 'g')) AS art FROM c)
        |SELECT source, count(*) AS n_docs,
        | CAST(sum(CASE WHEN p THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupted,
        | CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_ascii,
        | CAST(sum(CASE WHEN art > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
        | CAST(sum(art) AS BIGINT) AS artifacts,
        | CAST(sum(CASE WHEN p AND a THEN 1 ELSE 0 END) AS BIGINT) AS n_fixed,
        | CAST(sum(CASE WHEN NOT p AND a THEN 1 ELSE 0 END) AS BIGINT) AS n_clean_untouched
        |FROM x GROUP BY 1 ORDER BY source""".stripMargin,

    // Same quasi-key grouping, same band arithmetic, same risk algebra.
    "d71_k_anonymity" ->
      """WITH g AS (SELECT c_nationkey, CAST(floor(c_acctbal / 2000) AS BIGINT) AS band,
        |    count(*) AS n, count(DISTINCT c_mktsegment) AS l FROM customer GROUP BY 1, 2)
        |SELECT 5 AS k, CAST(sum(n) AS BIGINT) AS n_rows, count(*) AS n_groups,
        | CAST(min(n) AS BIGINT) AS min_group_size,
        | CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_risky_groups,
        | CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
        | round(sum(CASE WHEN n < 5 THEN n ELSE 0 END) * 1.0 / sum(n), 4) AS risk_share,
        | CAST(min(l) AS BIGINT) AS min_l_diversity
        |FROM g""".stripMargin,

    // d15's recursive clustering with per-pair scores kept; densities
    // and similarity floors over the same rounded edge table.
    "d70_cluster_audit" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
        |       FROM toks, UNNEST(range(1, len(t)-1)) AS u(i)),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        |      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1,2),
        |dup AS (SELECT doc_a, doc_b, round(inter*1.0/(x.n + y.n - inter), 4) AS j
        |        FROM p JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
        |        WHERE inter*1.0/(x.n + y.n - inter) >= 0.5),
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM dup UNION SELECT doc_b, doc_a FROM dup),
        |reach(id, r) AS (SELECT src, src FROM e
        |  UNION SELECT reach.id, e.dst FROM reach JOIN e ON reach.r = e.src),
        |lab AS (SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id FROM reach GROUP BY 1),
        |szs AS (SELECT cluster_id, count(*) AS n_members FROM lab GROUP BY 1),
        |ed AS (SELECT lab.cluster_id, count(*) AS n_edges,
        |    min(j) AS minj, avg(j) AS avgj
        |  FROM dup JOIN lab ON dup.doc_a = lab.doc_id GROUP BY 1)
        |SELECT s.cluster_id, s.n_members, ed.n_edges,
        | round(ed.n_edges * 2.0 / (s.n_members * (s.n_members - 1)), 4) AS density,
        | round(minj, 4) AS min_jaccard, round(avgj, 4) AS avg_jaccard
        |FROM szs s JOIN ed USING (cluster_id) ORDER BY cluster_id""".stripMargin,

    // d66's rank-window candidates vs the (effectively uncapped at this
    // corpus) exact-Jaccard truth; same normalization and counts.
    "d69_blocker_eval" ->
      """WITH rk AS (SELECT doc_id, row_number() OVER (ORDER BY n_chars, doc_id) AS r FROM documents),
        |cand AS (SELECT DISTINCT least(a.doc_id, b.doc_id) AS doc_a, greatest(a.doc_id, b.doc_id) AS doc_b
        |  FROM rk a JOIN rk b ON b.r > a.r AND b.r <= a.r + 10),
        |toks AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
        |       FROM toks, UNNEST(range(1, len(t)-1)) AS u(i)),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        |      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1,2),
        |truth AS (SELECT doc_a, doc_b FROM p JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
        |          WHERE inter*1.0/(x.n + y.n - inter) >= 0.5),
        |f AS (SELECT count(*) AS n_found FROM cand JOIN truth USING (doc_a, doc_b)),
        |t AS (SELECT count(*) AS n_true FROM truth),
        |c AS (SELECT count(*) AS n_candidates FROM cand)
        |SELECT t.n_true, c.n_candidates, f.n_found,
        | round(CASE WHEN t.n_true > 0 THEN f.n_found * 1.0 / t.n_true END, 4) AS recall,
        | round(CASE WHEN c.n_candidates > 0 THEN f.n_found * 1.0 / c.n_candidates END, 4) AS precision
        |FROM t, c, f""".stripMargin,

    // Token grid keyed by the UNFILTERED split position (the hash key),
    // ROWS frames over the surviving sequence, same sentinel assembly;
    // unmasked docs coalesce the all-null target agg to '' to match
    // array_join's null-skipping empty string.
    "d68_span_corrupt" ->
      """WITH toks AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS t FROM documents),
        |g AS (SELECT doc_id, CAST(u.i AS BIGINT) AS i, t[CAST(u.i AS INT)] AS tok
        |      FROM toks, UNNEST(range(1, len(t)+1)) AS u(i) WHERE t[CAST(u.i AS INT)] <> ''),
        |s AS (SELECT doc_id, i, tok,
        |   CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR) || ':42'), 1, 15) AS BIGINT) % 1000000 < 50000
        |        THEN 1 ELSE 0 END AS st FROM g),
        |m AS (SELECT doc_id, i, tok, st,
        |   max(st) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) = 1 AS mk,
        |   coalesce(max(st) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), 0) = 1 AS pmk
        |  FROM s),
        |x AS (SELECT doc_id, i, tok, mk, (mk AND NOT pmk) AS nw,
        |   sum(CASE WHEN mk AND NOT pmk THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id ORDER BY i
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM m),
        |y AS (SELECT doc_id, i, mk, nw, '<extra_id_' || CAST(grp - 1 AS VARCHAR) || '>' AS sent, tok FROM x),
        |a AS (SELECT doc_id, count(*) AS n_tokens,
        |   CAST(sum(CASE WHEN mk THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
        |   CAST(sum(CASE WHEN nw THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
        |   coalesce(string_agg(CASE WHEN NOT mk THEN tok WHEN nw THEN sent END, ' ' ORDER BY i), '') AS input_text,
        |   coalesce(string_agg(CASE WHEN nw THEN sent || ' ' || tok WHEN mk THEN tok END, ' ' ORDER BY i), '') AS target_text
        |  FROM y GROUP BY 1)
        |SELECT doc_id, n_tokens, n_masked, n_spans,
        | substr(md5(input_text), 1, 8) AS input_md5, substr(md5(target_text), 1, 8) AS target_md5
        |FROM a ORDER BY doc_id""".stripMargin,

    // d15's recursive-CTE clustering (singletons self-label via the
    // left-join coalesce) + d33's md5-bucket assignment on the LABEL.
    "d67_cluster_safe_split" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
        |       FROM toks, UNNEST(range(1, len(t)-1)) AS u(i)),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        |      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1,2),
        |dup AS (SELECT doc_a, doc_b FROM p JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
        |        WHERE inter*1.0/(x.n + y.n - inter) >= 0.5),
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM dup UNION SELECT doc_b, doc_a FROM dup),
        |reach(id, r) AS (SELECT src, src FROM e
        |  UNION SELECT reach.id, e.dst FROM reach JOIN e ON reach.r = e.src),
        |lab AS (SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id FROM reach GROUP BY 1),
        |assigned AS (SELECT d.doc_id, coalesce(lab.cluster_id, d.doc_id) AS cid
        |  FROM documents d LEFT JOIN lab ON d.doc_id = lab.doc_id),
        |b AS (SELECT doc_id, cid,
        |   CAST('0x' || substr(md5(CAST(cid AS VARCHAR)), 1, 15) AS BIGINT) % 1000000 AS bk
        |  FROM assigned)
        |SELECT CASE WHEN bk < 800000 THEN 'train' WHEN bk < 900000 THEN 'val' ELSE 'test' END AS split,
        | count(*) AS n_docs, count(DISTINCT cid) AS n_clusters,
        | CAST(sum(doc_id) AS BIGINT) AS doc_id_sum
        |FROM b GROUP BY 1 ORDER BY split""".stripMargin,

    // Same (n_chars, doc_id) total order, same rank-window candidates,
    // d4's uncapped distinct-shingle Jaccard on exactly those pairs.
    "d66_sorted_neighborhood" ->
      """WITH rk AS (SELECT doc_id, row_number() OVER (ORDER BY n_chars, doc_id) AS r FROM documents),
        |cand AS (SELECT least(a.doc_id, b.doc_id) AS doc_a, greatest(a.doc_id, b.doc_id) AS doc_b
        |  FROM rk a JOIN rk b ON b.r > a.r AND b.r <= a.r + 10),
        |toks AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
        |       FROM toks, UNNEST(range(1, len(t)-1)) AS u(i)),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |p AS (SELECT c.doc_a, c.doc_b, count(*) AS inter
        |      FROM cand c JOIN sh a ON a.doc_id = c.doc_a
        |      JOIN sh b ON b.doc_id = c.doc_b AND b.g = a.g
        |      GROUP BY 1, 2)
        |SELECT doc_a, doc_b, round(inter*1.0/(x.n + y.n - inter), 4) AS jaccard
        |FROM p JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
        |WHERE inter*1.0/(x.n + y.n - inter) >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,

    // Same centroid construction ((label, dim) averages reassembled in
    // dim order), same L-centroid exact scoring, max-by-VALUE only.
    "d65_label_cohesion" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cell AS (SELECT label, i, avg(v[CAST(i AS INT)]) AS c
        |  FROM e CROSS JOIN range(1, 65) t(i) GROUP BY 1, 2),
        |cent AS (SELECT label AS cl, list(c ORDER BY i) AS cv FROM cell GROUP BY 1),
        |sc AS (SELECT e.vec_id, e.label, cent.cl,
        |   list_inner_product(v, cv) / (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(cv, cv))) AS cos
        |  FROM e CROSS JOIN cent),
        |pv AS (SELECT vec_id, label,
        |   max(CASE WHEN label = cl THEN cos END) AS own,
        |   max(CASE WHEN label <> cl THEN cos END) AS oth
        |  FROM sc GROUP BY 1, 2)
        |SELECT label, count(*) AS n, round(avg(own), 4) AS cohesion,
        | round(avg(oth), 4) AS separation, round(avg(own - oth), 4) AS margin
        |FROM pv GROUP BY 1 ORDER BY label""".stripMargin,

    // d54's BM25 chain at k=20 + d5's cosine chain at k=20 for query
    // vectors 1..3, fused with the same 1/(60+rank) sum, agreement
    // count, and (rrf desc, id) election.
    "d64_hybrid_rrf" ->
      """WITH q(query_id, query_text) AS (VALUES
        |  (CAST(1 AS BIGINT), 'spark sort merge'),
        |  (CAST(2 AS BIGINT), 'stream window value'),
        |  (CAST(3 AS BIGINT), 'filter scan column')),
        |toks AS (SELECT doc_id, unnest(string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> '' GROUP BY 1,2),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks WHERE term <> '' GROUP BY 1),
        |dfx AS (SELECT term, count(*) AS df_t FROM tf GROUP BY 1),
        |stats AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
        |  (SELECT avg(coalesce(dl.dl, 0)) FROM documents d LEFT JOIN dl ON d.doc_id = dl.doc_id) AS avgdl),
        |qt AS (SELECT DISTINCT query_id, unnest(string_split(regexp_replace(lower(trim(query_text)),'\s+',' ','g'), ' ')) AS term FROM q),
        |scored AS (SELECT qt.query_id, tf.doc_id,
        |   sum(ln(1.0 + (stats.n_docs - dfx.df_t + 0.5)/(dfx.df_t + 0.5))
        |     * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))) AS score
        |  FROM qt JOIN tf USING (term) JOIN dfx USING (term)
        |   JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
        |  GROUP BY 1, 2),
        |bm AS (SELECT qid, id, rank FROM (SELECT query_id AS qid, doc_id AS id,
        |   CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT) AS rank
        |  FROM scored) WHERE rank <= 20),
        |qv AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id IN (1, 2, 3)),
        |cv AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |cs AS (SELECT qid, cid,
        |   list_inner_product(qv,cv) / (sqrt(list_inner_product(qv,qv)) * sqrt(list_inner_product(cv,cv))) AS cos
        |  FROM qv, cv WHERE qid <> cid),
        |co AS (SELECT qid, id, rank FROM (SELECT qid, cid AS id,
        |   CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS BIGINT) AS rank
        |  FROM cs) WHERE rank <= 20),
        |u AS (SELECT * FROM bm UNION ALL SELECT * FROM co),
        |f AS (SELECT qid, id, sum(1.0/(60 + rank)) AS rrf, count(*) AS n_lists FROM u GROUP BY 1, 2),
        |fr AS (SELECT qid, id, rrf, n_lists,
        |   CAST(row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, id) AS BIGINT) AS rank FROM f)
        |SELECT qid, id, round(rrf, 6) AS rrf, n_lists, rank
        |FROM fr WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,

    // The staged regex chain TextNormalize's one-pass state machine is
    // spec-proven equal to: char-identical decoration via chr(), CRLF
    // first, then the map/removal classes (RE2 \x{...} escapes), then
    // whitespace structure, then end trim.
    "d63_text_normalize" ->
      """WITH deco AS (SELECT doc_id, '  ' || text || ' ' || chr(8212) || ' ' || chr(8220)
        |    || 'q' || chr(8216) || 'x' || chr(8217) || chr(160) || 'z' || chr(8203)
        |    || chr(7) || chr(9) || chr(9) || 'tail' || chr(8230) || chr(13)
        |    || chr(10) || chr(10) || chr(10) || chr(10) AS t FROM documents),
        |n AS (SELECT doc_id,
        |  trim(
        |   regexp_replace(
        |    regexp_replace(
        |     regexp_replace(
        |      regexp_replace(
        |       regexp_replace(
        |        regexp_replace(
        |         regexp_replace(
        |          regexp_replace(
        |           regexp_replace(
        |            replace(replace(t, chr(13) || chr(10), chr(10)), chr(8230), '...'),
        |            '[\x{000D}\x{0085}\x{2028}\x{2029}]', chr(10), 'g'),
        |           '[\x{00A0}\x{1680}\x{2000}-\x{200A}\x{202F}\x{205F}\x{3000}]', ' ', 'g'),
        |          '[\x{2018}-\x{201B}]', chr(39), 'g'),
        |         '[\x{201C}-\x{201F}]', '"', 'g'),
        |        '[\x{2010}-\x{2015}\x{2212}]', '-', 'g'),
        |       '[\x{0000}-\x{0008}\x{000B}\x{000C}\x{000E}-\x{001F}\x{007F}\x{200B}-\x{200D}\x{FEFF}]', '', 'g'),
        |      '[ \t]+', ' ', 'g'),
        |     ' *\n *', chr(10), 'g'),
        |    '\n{3,}', chr(10) || chr(10), 'g'),
        |   ' ' || chr(10)) AS norm FROM deco)
        |SELECT doc_id, CAST(length(norm) AS BIGINT) AS n_norm,
        | substr(md5(norm), 1, 8) AS norm_md5
        |FROM n ORDER BY doc_id""".stripMargin,

    // Same windowed-md5 boundary rule, same tiling, same rollup.
    "d83_cdc_chunks" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents
        |  WHERE text IS NOT NULL AND length(text) > 0),
        |bd AS (SELECT doc_id, text, n,
        |    CASE WHEN n >= 16 THEN list_filter(range(16, n + 1),
        |        i -> substr(md5(substr(text, CAST(i AS INT) - 15, 16)), 1, 1) = '0')
        |      ELSE [] END AS bs
        |  FROM d),
        |ch AS (SELECT doc_id, text,
        |    list_prepend(CAST(1 AS BIGINT), list_transform(bs, b -> b + 1)) AS ss,
        |    list_append(bs, CAST(n AS BIGINT)) AS es FROM bd),
        |ex AS (SELECT doc_id, text, ss, es,
        |    UNNEST(range(1, len(ss) + 1)) AS i FROM ch),
        |c2 AS (SELECT doc_id,
        |    md5(substr(text, CAST(ss[i] AS INT), CAST(es[i] - ss[i] + 1 AS INT))) AS h,
        |    es[i] - ss[i] + 1 AS len
        |  FROM ex WHERE es[i] >= ss[i])
        |SELECT h, count(*) AS n_copies, min(len) AS len,
        |  CAST((count(*) - 1) * min(len) AS BIGINT) AS saved_chars
        |FROM c2 GROUP BY h HAVING count(*) > 1
        |ORDER BY saved_chars DESC, h LIMIT 20""".stripMargin,

    // Both snapshots chunked through one side-tagged pipeline, then the
    // same min-multiplicity shared-bytes join and status rules.
    "d83b_cdc_change" ->
      """WITH base AS (SELECT doc_id, text FROM documents
        |  WHERE text IS NOT NULL AND length(text) > 0),
        |u AS (SELECT 'a' AS side, doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'EDIT: ' || text ELSE text END AS text
        |  FROM base WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT 'b' AS side, doc_id, text FROM base WHERE doc_id % 11 <> 0),
        |d AS (SELECT side, doc_id, text, length(text) AS n FROM u),
        |bd AS (SELECT side, doc_id, text, n,
        |    CASE WHEN n >= 16 THEN list_filter(range(16, n + 1),
        |        i -> substr(md5(substr(text, CAST(i AS INT) - 15, 16)), 1, 1) = '0')
        |      ELSE [] END AS bs
        |  FROM d),
        |ch AS (SELECT side, doc_id, text,
        |    list_prepend(CAST(1 AS BIGINT), list_transform(bs, b -> b + 1)) AS ss,
        |    list_append(bs, CAST(n AS BIGINT)) AS es FROM bd),
        |ex AS (SELECT side, doc_id, text, ss, es,
        |    UNNEST(range(1, len(ss) + 1)) AS i FROM ch),
        |c2 AS (SELECT side, doc_id,
        |    md5(substr(text, CAST(ss[i] AS INT), CAST(es[i] - ss[i] + 1 AS INT))) AS h,
        |    es[i] - ss[i] + 1 AS len
        |  FROM ex WHERE es[i] >= ss[i]),
        |ph AS (SELECT side, doc_id, h, count(*) AS cnt, min(len) AS len
        |  FROM c2 GROUP BY 1, 2, 3),
        |j AS (SELECT coalesce(pa.doc_id, pb.doc_id) AS id,
        |    pa.cnt AS na, pa.len AS la, pb.cnt AS nb, pb.len AS lb
        |  FROM (SELECT * FROM ph WHERE side = 'a') pa
        |  FULL OUTER JOIN (SELECT * FROM ph WHERE side = 'b') pb
        |    ON pa.doc_id = pb.doc_id AND pa.h = pb.h),
        |per AS (SELECT id, sum(na * la) AS tb, sum(nb * lb) AS ta,
        |    sum(least(coalesce(na, 0), coalesce(nb, 0)) * coalesce(la, lb)) AS sh
        |  FROM j GROUP BY 1),
        |st AS (SELECT id, sh,
        |    CASE WHEN tb IS NULL THEN 'added' WHEN ta IS NULL THEN 'deleted'
        |         WHEN sh = ta AND tb = ta THEN 'unchanged' ELSE 'changed' END AS status,
        |    CASE WHEN ta IS NULL THEN NULL
        |         ELSE round(1.0 - sh * 1.0 / ta, 6) END AS cr
        |  FROM per)
        |SELECT status, count(*) AS n_docs,
        |  CASE WHEN count(cr) > 0 THEN
        |    round(CAST(sum(CAST(cr AS DECIMAL(10,6))) AS DOUBLE) / count(cr), 6)
        |  END AS mean_ratio,
        |  CAST(sum(sh) AS BIGINT) AS shared_total
        |FROM st GROUP BY 1 ORDER BY status""".stripMargin
  )
}
