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


/** D-series VECTOR/ANN driver queries (brute-force/LSH/IVF/PQ
  * similarity, embedding QA, PCA, retrieval) with their DuckDB
  * oracles — split from the former monolithic DataQueries registry;
  * SparkEntry composes the union. */
private[graft] object VectorQueries {

  /** Embeddings-corpus size memoized per sf dir. LSH auto-sizing needs
    * |corpus|, and a production caller passes it from their metastore
    * instead of paying a count job at every plan construction — here the
    * first of d6/d12 to run pays one metadata-cheap parquet count and
    * the rest reuse it. */
  private val corpusSizes = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def embeddingsCount(s: SparkSession, dir: String): Long =
    corpusSizes.computeIfAbsent(dir, _ => Tables.embeddings(s, dir).count())

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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

    // IVF-PQ ANN (D79), promoted from spec-only to the oracle
    // standard: d23's md5-keyed IVF sharding composed with d78's
    // md5-seeded product quantizer, both at rounds = 0 so the whole
    // model is a pure function of the data and the oracle can rebuild
    // it — codebook seeds, corpus codes, probe ranking, and the
    // asymmetric-distance (ADC) top-5 are ALL replayed in SQL, so the
    // approximate result itself is hash-checked (the d23b discipline).
    // rerank = 0 keeps the graded row purely ADC; the exact-rerank
    // path is PqSpec's job.
    "d79_ivfpq" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val model = graft.vectors.Pq.train(emb, "vec_id", "embedding",
        dim = 64, m = 8, kCodes = 16, rounds = 0)
      Ann.ivfPqTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 5, nLists = 8, nProbe = 4, pq = model)
        .orderBy("qid", "rank")
    }),

    // The IVF-PQ QUALITY row (D79b): recall@5 of the d79 ADC ranking
    // against the exact squared-L2 top-5 truth (PQ's native metric —
    // NOT d5's cosine, the vectors are unnormalized), per query. The
    // oracle replays both pipelines exactly, so the recall VALUES are
    // hash-checked, not bound-pinned — the ANN quality claim becomes a
    // graded artifact instead of a spec assertion.
    "d79b_ivfpq_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val model = graft.vectors.Pq.train(emb, "vec_id", "embedding",
        dim = 64, m = 8, kCodes = 16, rounds = 0)
      val approx = Ann.ivfPqTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nLists = 8, nProbe = 4, pq = model)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"),
          graft.vectors.VectorOps.toDouble(col("embedding")).as("qv"))
      // exact L2 truth: 10-query side broadcasts, corpus never shuffles
      val truth = broadcast(q)
        .join(emb.select(col("vec_id").as("cid"),
          graft.vectors.VectorOps.toDouble(col("embedding")).as("cv")))
        .filter(col("qid") =!= col("cid"))
        .withColumn("__d", aggregate(zip_with(col("qv"), col("cv"),
          (a, b) => (a - b) * (a - b)), lit(0.0), _ + _))
        .withColumn("__r", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("qid")
            .orderBy(col("__d").asc, col("cid").asc)))
        .filter(col("__r") <= 5)
        .select(col("qid"), col("cid"))
      approx.select(col("qid"), col("cid"))
        .join(truth.withColumn("__hit", lit(1)), Seq("qid", "cid"), "left")
        .groupBy("qid")
        .agg(sum(coalesce(col("__hit"), lit(0))).as("n_hit"))
        .select(col("qid"), lit(5L).as("k"), col("n_hit"),
          round(col("n_hit") / 5.0, 4).as("recall"))
        .orderBy("qid")
    }),

    // D79c — the TRAINED-PQ graded row: d79/d79b pin rounds = 0 so the
    // oracle can replay the model bit-for-bit; the production path is
    // rounds = 3 Lloyd, whose refined codebooks are FP-iteration
    // artifacts DuckDB cannot replay order-identically. Graded with
    // the c8b bound-pinning technique: the rounds=0 half (truth-hit
    // total) is hash-checked exactly — the oracle replays it — and the
    // trained half rides two pinned booleans of DIFFERENT strength:
    // err_nonincreasing is a theorem (Lloyd's k-means objective is
    // monotone non-increasing per round, so it pins the
    // implementation, not luck), while trained_recall_ge is an
    // EMPIRICAL pin on the committed corpus — training optimizes
    // quantization error, not top-5 recall, and a regenerated corpus
    // (or an ulp shift in lloydRound's partial-agg means) could
    // legitimately flip it; if it ever does, suspect the pin before
    // the library.
    "d79c_ivfpq_trained" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val qs = emb.filter(col("vec_id") < 10)
      val q = qs.select(col("vec_id").as("qid"),
        graft.vectors.VectorOps.toDouble(col("embedding")).as("qv"))
      val truth = broadcast(q)
        .join(emb.select(col("vec_id").as("cid"),
          graft.vectors.VectorOps.toDouble(col("embedding")).as("cv")))
        .filter(col("qid") =!= col("cid"))
        .withColumn("__d", aggregate(zip_with(col("qv"), col("cv"),
          (a, b) => (a - b) * (a - b)), lit(0.0), _ + _))
        .withColumn("__r", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("qid")
            .orderBy(col("__d").asc, col("cid").asc)))
        .filter(col("__r") <= 5)
        .select(col("qid"), col("cid"))
      val m0 = graft.vectors.Pq.train(emb, "vec_id", "embedding",
        dim = 64, m = 8, kCodes = 16, rounds = 0)
      // the trained model CONTINUES from m0 (train(rounds=3) ≡
      // refine(train(rounds=0), 3)) — skips re-running the seed job
      val mt = graft.vectors.Pq.refine(emb, "embedding", m0, rounds = 3)
      def top5(model: graft.vectors.Pq.PqModel, tag: Int) =
        Ann.ivfPqTopK(emb, qs, "vec_id", "embedding",
          k = 5, nLists = 8, nProbe = 4, pq = model)
          .select(lit(tag).as("m"), col("qid"), col("cid"))
      // bounded driver scalars (2 models x 10 queries): BOTH models'
      // truth-hit totals and query counts in ONE job — the row is a
      // driver scalar either way, and this query is job-count-bound
      // (iterative training + two ranking chains), not data-bound
      val hitRows = top5(m0, 0).unionAll(top5(mt, 1))
        .join(truth.withColumn("__h", lit(1)), Seq("qid", "cid"), "left")
        .groupBy("m").agg(sum(coalesce(col("__h"), lit(0))).as("hits"),
          countDistinct(col("qid")).as("nq"))
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
      // fused native encode+reconstruction error (bit-identical fold
      // order — see PqExpressions); the 1e-6 slack below is unchanged
      def errCol(model: graft.vectors.Pq.PqModel) = model.quantErr(col("embedding"))
      // both models' total quantization error in one corpus pass
      val errRow = emb.select(sum(errCol(m0)).as("e0"), sum(errCol(mt)).as("et")).head()
      val (h0, nQueries) = hitRows(0)
      val ht = hitRows(1)._1
      Seq((5L, nQueries, h0, ht >= h0, errRow.getDouble(1) <= errRow.getDouble(0) + 1e-6))
        .toDF("k", "n_queries", "n_hit_r0", "trained_recall_ge", "err_nonincreasing")
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

    // D18 promoted: the native codegen'd DotProduct expression itself
    // on the graded surface. Every embedding is dotted against the
    // min-vec_id query vector through BOTH formulations — the Catalyst
    // expression and the aggregate(zip_with) fold it contractually
    // equals (the RewriteDotProduct substitution precondition) — and
    // the bit-equality rides each row as `fold_equal`; the oracle
    // replays the same in-order 64-term fold (the d79 FP-pinning
    // technique), so the emitted double is hash-compared, not rounded.
    "d18_native_dot" -> ((s, dir) => {
      import graft.expressions.VectorExpressions
      import graft.vectors.VectorOps
      val e = Tables.embeddings(s, dir)
      val q = e.orderBy("vec_id").limit(1)
        .select(VectorOps.toDouble(col("embedding")).as("qv"))
      e.select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("__v"))
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          VectorExpressions.dotNative(col("__v"), col("qv")).as("dot"),
          (VectorExpressions.dotNative(col("__v"), col("qv")) ===
            VectorOps.dot(col("__v"), col("qv"))).as("fold_equal"))
        .orderBy("vec_id")
    })
  )

  /** Shared d79/d79b oracle prefix: d23's md5-keyed IVF chain (8
    * centroids → rn=1 assignment → 4-probe ranking for queries
    * vec_id < 10) composed with d78's md5-seeded PQ chain (16 codes,
    * 8 subspaces × 8 dims → per-(vector, subspace) nearest code) and
    * the ADC distance (Σ_j of the query-subvector-to-assigned-code
    * squared distance — EXACTLY the distance to the decoded vector),
    * ending in `r5(qid, cid, adc, rank)` = the ADC top-5. Every sum
    * is an IN-ORDER list fold (list_transform over an index range,
    * list(… ORDER BY j)) rather than a GROUP-BY sum: Spark's
    * `aggregate(zip_with(…))` accumulates left-to-right in dimension
    * order, and only the same fold order keeps near-tied ADC
    * distances bitwise comparable across engines — a hash-bucketed
    * SQL sum may add in any order, and the rank cut would flip on a
    * sub-ulp tie. The GROUPING must match too, not just the per-term
    * order: Spark's rerank=0 ADC is ONE flat 64-term fold over
    * (q[d] − decoded[d])², not a sum of 8 per-subspace subtotals —
    * FP addition is non-associative, so ((a+b)+(c+d)) ≠ (((a+b)+c)+d)
    * at the ulp level. The `decoded` CTE therefore materializes the
    * full decoded vector from the assigned codes and `adc` replays
    * the identical flat fold. */
  private val ivfPqCtes: String =
    """c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
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
      |seed AS (SELECT v, row_number() OVER (ORDER BY h, id) - 1 AS code FROM (
      |    SELECT v, CAST(vec_id AS VARCHAR) AS id,
      |      CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
      |    FROM c) ORDER BY h, id LIMIT 16),
      |dist AS (SELECT c.vec_id, CAST(t.j AS INT) AS j, s.code,
      |   list_aggregate(list_transform(range(0, 8), d ->
      |     (c.v[CAST(t.j AS INT) * 8 + d + 1] - s.v[CAST(t.j AS INT) * 8 + d + 1])
      |     * (c.v[CAST(t.j AS INT) * 8 + d + 1] - s.v[CAST(t.j AS INT) * 8 + d + 1])), 'sum') AS dd
      |  FROM c, range(8) t(j), seed s),
      |best AS (SELECT vec_id, j, code FROM (
      |      SELECT vec_id, j, code, row_number() OVER (PARTITION BY vec_id, j ORDER BY dd, code) AS rn
      |      FROM dist) WHERE rn = 1),
      |decoded AS (SELECT b.vec_id AS cid,
      |   list(s.v[b.j * 8 + t.d + 1] ORDER BY b.j * 8 + t.d) AS dv
      |  FROM best b JOIN seed s USING (code), range(8) t(d) GROUP BY 1),
      |adc AS (SELECT p.qid, a.cid,
      |   list_aggregate(list_transform(range(0, 64), d ->
      |     (q.v[d + 1] - dec.dv[d + 1]) * (q.v[d + 1] - dec.dv[d + 1])), 'sum') AS adc
      |  FROM probes p JOIN assign a USING (list_id)
      |  JOIN decoded dec ON dec.cid = a.cid
      |  JOIN c q ON q.vec_id = p.qid
      |  WHERE p.qid <> a.cid),
      |r5 AS (SELECT qid, cid, adc,
      |   CAST(row_number() OVER (PARTITION BY qid ORDER BY adc, cid) AS BIGINT) AS rank
      |  FROM adc QUALIFY rank <= 5)""".stripMargin

  val oracleSql: Map[String, String] = Map(

    // The full IVF-PQ replay: every stage of the model is
    // md5-deterministic at rounds = 0, so the ADC top-5 itself is the
    // compared surface (see ivfPqCtes).
    "d79_ivfpq" ->
      s"""WITH $ivfPqCtes
         |SELECT qid, cid, round(adc, 4) AS dist, rank
         |FROM r5 ORDER BY qid, rank""".stripMargin,

    // ADC top-5 intersected with the exact squared-L2 top-5, the
    // truth ranked by the same in-order elementwise fold Spark runs
    // (see ivfPqCtes — a closed form |q|^2+|c|^2-2qc is algebraically
    // equal but not FP-identical, and a near-tie at rank 5 would flip
    // membership). Left join keeps zero-hit queries.
    "d79b_ivfpq_recall" ->
      s"""WITH $ivfPqCtes,
         |t5 AS (SELECT qid, cid FROM (
         |  SELECT q.vec_id AS qid, cc.vec_id AS cid,
         |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |      list_aggregate(list_transform(range(0, 64), d ->
         |        (q.v[d + 1] - cc.v[d + 1]) * (q.v[d + 1] - cc.v[d + 1])), 'sum') ASC,
         |      cc.vec_id) AS rn
         |  FROM c q, c cc WHERE q.vec_id < 10 AND q.vec_id <> cc.vec_id) WHERE rn <= 5),
         |ids AS (SELECT DISTINCT qid FROM r5),
         |h AS (SELECT r5.qid, count(*) AS n FROM r5 JOIN t5 USING (qid, cid) GROUP BY 1)
         |SELECT ids.qid, CAST(5 AS BIGINT) AS k,
         | CAST(coalesce(h.n, 0) AS BIGINT) AS n_hit,
         | round(coalesce(h.n, 0) / 5.0, 4) AS recall
         |FROM ids LEFT JOIN h USING (qid) ORDER BY qid""".stripMargin,

    // The rounds=0 half replayed exactly (same r5/t5 chains as d79b,
    // totals instead of per-query rows); the trained half is the two
    // pinned booleans the Spark side derives from Lloyd's monotone
    // objective and the pinned corpus.
    "d79c_ivfpq_trained" ->
      s"""WITH $ivfPqCtes,
         |t5 AS (SELECT qid, cid FROM (
         |  SELECT q.vec_id AS qid, cc.vec_id AS cid,
         |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |      list_aggregate(list_transform(range(0, 64), d ->
         |        (q.v[d + 1] - cc.v[d + 1]) * (q.v[d + 1] - cc.v[d + 1])), 'sum') ASC,
         |      cc.vec_id) AS rn
         |  FROM c q, c cc WHERE q.vec_id < 10 AND q.vec_id <> cc.vec_id) WHERE rn <= 5),
         |h AS (SELECT count(*) AS n FROM r5 JOIN t5 USING (qid, cid))
         |SELECT CAST(5 AS BIGINT) AS k,
         | (SELECT CAST(count(DISTINCT qid) AS BIGINT) FROM r5) AS n_queries,
         | (SELECT CAST(n AS BIGINT) FROM h) AS n_hit_r0,
         | TRUE AS trained_recall_ge, TRUE AS err_nonincreasing""".stripMargin,

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

    // In-order 64-term fold (float→double widening is exact in both
    // engines; products and the left-to-right sum are the same IEEE
    // ops), so `dot` is bitwise-comparable without rounding.
    "d18_native_dot" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT v AS qv FROM e ORDER BY vec_id LIMIT 1)
        |SELECT e.vec_id,
        | list_aggregate(list_transform(range(0, 64), d -> e.v[d + 1] * q.qv[d + 1]), 'sum') AS dot,
        | TRUE AS fold_equal
        |FROM e, q ORDER BY vec_id""".stripMargin
  )
}
