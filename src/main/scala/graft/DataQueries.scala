package graft

import graft.analytics.Kpis
import graft.dedup.Dedup
import graft.etl.Checks
import graft.multimodal.{AudioFingerprint, Multimodal}
import graft.operators.{Packing, Sampling}
import graft.text.TfIdf
import graft.similarity.Ann
import graft.text.{Redact, TextFunctions}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._


/** D-series driver queries, GENERAL bucket (sampling, mixing,
  * packing, multimodal, privacy, classifier scoring) with their DuckDB
  * oracles. The dedup / text / vector families live in
  * [[DedupQueries]] / [[TextQueries]] / [[VectorQueries]];
  * SparkEntry composes the union. */
private[graft] object DataQueries {

  /** d32 model parameters: a deterministic pseudo-random weight vector
    * (any fixed model works — the operator under test is the hashed
    * inference, not the weights). Inlined as literals in BOTH the Spark
    * plan and the generated DuckDB oracle. */
  private val d32Dim = 64
  private val d32Weights: Seq[Double] =
    (0 until d32Dim).map(i => math.round(math.sin(i + 1.0) * 5000.0) / 10000.0)
  private val d32Bias = -0.1

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "d13_multimodal" -> ((s, dir) => {
      val media = Multimodal.asMedia(Tables.documents(s, dir), "doc_id", "text", "text/plain", "source")
      Multimodal.withBinaryMetrics(media)
        .groupBy("source", "media_type")
        .agg(count(lit(1)).as("n"),
          sum("byte_len").as("sum_bytes"),
          countDistinct(col("sha256")).as("n_checksums"))
        .orderBy("source")
    }),

    // D75 — audio fingerprint SIGNATURE graded closed-form (the a22
    // WARC discipline: both engines derive byte-identical input from
    // key arithmetic). The codec boundary (`monoSamples`, javax.sound
    // decode) stays spec-covered on synthesized WAVs — this row grades
    // everything after decode: per doc_id, 64 windows × 40 samples of
    // a ±A square wave with per-window amplitude
    // A(m,w) = ((m·31 + w·17) mod 101)/101 (17 coprime 101 → 64
    // DISTINCT window energies, so median threshold decisions sit
    // ≥1/202 from every energy — far outside FP noise), run through
    // the REAL AudioFingerprint.signature; the oracle replays the
    // RMS-envelope → rank-median → bit table. The signature long is
    // compared as its set-bit positions (bit 63 would sign-overflow a
    // DuckDB BIGINT build of 2^63). Narrow per-row work — scales
    // linearly with the corpus.
    "d75_audio_sig" -> ((s, dir) => {
      import s.implicits._
      val perWin = 40
      Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { m =>
            val samples = new Array[Double](64 * perWin)
            var w = 0
            while (w < 64) {
              val a = ((m * 31 + w * 17) % 101) / 101.0
              var i = 0
              while (i < perWin) {
                samples(w * perWin + i) = if (i % 2 == 0) a else -a
                i += 1
              }
              w += 1
            }
            val (fp, rms) = AudioFingerprint.signature(samples)
            val bits = (0 until 64).filter(b => ((fp >>> b) & 1L) == 1L).mkString(",")
            (m, bits, java.lang.Long.bitCount(fp), rms)
          }
        }
        .toDF("media_id", "bits", "n_set", "rms")
        .orderBy("media_id")
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

    // Deterministic per-epoch global reshuffle (D30b): the epoch-7
    // order [[Sampling.epochShuffle]] produces — a range-partitioned
    // sort on md5("7:" || id) — materialized as an explicit position
    // via [[graft.operators.Ranking.globalRank]] over the same key, so
    // the ORDER itself survives the driver's row-order-insensitive
    // compare. Same distributed machinery (sampled range exchange +
    // per-partition sort + zipWithIndex), never a single-partition
    // rank window; the oracle replays the hash order in SQL.
    "d30b_epoch_shuffle" -> ((s, dir) => {
      val keyed = Tables.documents(s, dir).select(col("doc_id"))
        .withColumn("__ek", Sampling.epochShuffleKey(col("doc_id"), epoch = 7L))
      graft.operators.Ranking.globalRank(keyed,
          Seq(col("__ek").asc, col("doc_id").asc), as = "epoch_pos")
        .select(col("doc_id"), col("epoch_pos"))
        .orderBy("doc_id")
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
    })
  )

  val oracleSql: Map[String, String] = Map(

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

    "d13_multimodal" ->
      """SELECT source, 'text/plain' AS media_type, count(*) AS n,
        | CAST(sum(strlen(text)) AS BIGINT) AS sum_bytes,
        | count(DISTINCT sha256(text)) AS n_checksums
        |FROM documents GROUP BY 1,2 ORDER BY source""".stripMargin,

    // Envelope replay: window energy of a ±A square wave IS |A| (the
    // per-window mean of A² is exact up to ~1e-15, far inside the
    // ≥1/202 energy gaps); median = mean of 1-based ranks 32 and 33
    // (the code's (sorted[31]+sorted[32])/2); a bit is set iff energy
    // strictly exceeds it. rms = sqrt(mean A²) over equal windows.
    "d75_audio_sig" ->
      """WITH ids AS (SELECT doc_id AS media_id FROM documents),
        |wins AS (SELECT media_id, w,
        |   CAST((media_id*31 + w*17) % 101 AS DOUBLE)/101.0 AS e
        |  FROM ids CROSS JOIN (SELECT unnest(range(0,64)) AS w)),
        |rk AS (SELECT media_id, w, e,
        |   row_number() OVER (PARTITION BY media_id ORDER BY e) AS r FROM wins),
        |med AS (SELECT media_id, avg(e) AS med FROM rk
        |  WHERE r IN (32, 33) GROUP BY media_id)
        |SELECT rk.media_id,
        |  coalesce(string_agg(CASE WHEN rk.e > med.med
        |    THEN CAST(rk.w AS VARCHAR) END, ',' ORDER BY rk.w), '') AS bits,
        |  CAST(sum(CASE WHEN rk.e > med.med THEN 1 ELSE 0 END) AS INTEGER) AS n_set,
        |  sqrt(avg(rk.e * rk.e)) AS rms
        |FROM rk JOIN med USING (media_id)
        |GROUP BY rk.media_id ORDER BY media_id""".stripMargin,

    "d14_sample" ->
      """WITH b AS (SELECT lang, text,
        |  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000 AS bucket
        | FROM documents)
        |SELECT lang, count(*) AS n_kept, CAST(sum(length(text)) AS BIGINT) AS sum_chars
        |FROM b
        |WHERE bucket < (CASE WHEN lang = 'en' THEN 250000
        |                     WHEN lang = 'de' THEN 1000000 ELSE 100000 END)
        |GROUP BY 1 ORDER BY lang""".stripMargin,

    // The md5 epoch order replayed as a plain ORDER BY; the id
    // tiebreak is vacuous (md5 keys are unique) but mirrors the query.
    "d30b_epoch_shuffle" ->
      """SELECT doc_id,
        | CAST(row_number() OVER (ORDER BY md5('7:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS epoch_pos
        |FROM documents ORDER BY doc_id""".stripMargin,

    "d30_sample_k" ->
      """WITH b AS (SELECT lang, doc_id,
        |  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000 AS bucket
        | FROM documents),
        |r AS (SELECT lang, doc_id,
        |  row_number() OVER (PARTITION BY lang ORDER BY bucket, doc_id) AS rn FROM b)
        |SELECT lang, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS sum_ids
        |FROM r WHERE rn <= 7 GROUP BY 1 ORDER BY lang""".stripMargin,

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
        |FROM a ORDER BY doc_id""".stripMargin
  )
}
