package graft

import graft.operators.Sampling
import graft.text._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** D-series text-analysis driver rows, second file (tokenization —
  * BPE/unigram encode, tokenizer eval — cross-entropy scoring,
  * novelty, language segments, vocabulary/Zipf/Heaps fits,
  * collocations, log-odds, burstiness, TextRank, normalization,
  * mojibake repair) — split from [[TextQueries]] along the registry
  * midpoint purely for file size. [[TextQueries]] merges these maps
  * into the single surface SparkEntry exposes; the shared oracle
  * builders (Gopher CTE chains, boilerplate lambda) stay there.
  */
private[graft] object TextQueries2 {

  private[graft] val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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

    // Per-source quality-distribution drift vs the corpus: PSI +
    // chi-square over fixed equal-width bins of the d7 quality score.

    "d52_quality_drift" -> ((s, dir) =>
      graft.text.CorpusStats.qualityDrift(Tables.documents(s, dir),
          col("source"), graft.text.TextFunctions.qualityScore(col("text")), nBins = 10)
        .orderBy("slice")),

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

    // Unigram (SentencePiece-style) ENCODING under a CONSTRUCTED
    // singles-only model, so the Viterbi outcome has a closed form the
    // oracle replays exactly (character split — every single-char
    // piece at equal logp, unknown chars covered by the unk floor).
    // This pins the encode-path PLUMBING at corpus scale: Viterbi per
    // DISTINCT word, positional join-back, in-order reassembly. DP
    // optimality over multi-char vocabularies is pinned by
    // UnigramTokenizerSpec's non-degenerate models.

    "d73_unigram_encode" -> ((s, dir) => {
      val singles = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
      val model = graft.text.UnigramTokenizer.Model(
        pieces = singles.map(_ -> math.log(1.0 / singles.size)).toMap,
        maxPieceLen = 2, unkLogp = -100.0)
      graft.text.UnigramTokenizer.encode(
          Tables.documents(s, dir), col("doc_id"), col("text"), model)
        .select(col("doc_id"), col("n_pieces"),
          substring(md5(array_join(col("pieces"), " ")), 1, 8).as("pieces_md5"))
        .orderBy("doc_id")
    }),

    // D76 promoted: the tokenizer acceptance report under d73's
    // singles-only model, whose closed form makes every metric a pure
    // character aggregate — pieces per word = its character count,
    // unk pieces = its non-[a-z0-9] characters (the zh slice's CJK
    // text exercises the unk floor for real), chars_per_piece exactly
    // 1.0. The per-lang fertility/unk_share table is the cross-
    // lingual-equity readout the scaladoc promises, recomputed by the
    // oracle from raw text. Divisions are long/long → one double op,
    // engine-stable; rounded to 6 like the d7 family.

    "d76_tokenizer_eval" -> ((s, dir) => {
      val singles = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
      val model = graft.text.UnigramTokenizer.Model(
        pieces = singles.map(_ -> math.log(1.0 / singles.size)).toMap,
        maxPieceLen = 2, unkLogp = -100.0)
      graft.text.TokenizerEval.report(Tables.documents(s, dir),
          col("text"), col("lang"), model)
        .select(col("slice"), col("n_words"), col("n_pieces"),
          round(col("fertility"), 6).as("fertility"),
          col("chars_per_piece"),
          col("unk_pieces"),
          round(col("unk_share"), 6).as("unk_share"))
        .orderBy("slice")
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
    })
  )

  private[graft] val oracleSql: Map[String, String] = Map(

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

    // The singles-only model's closed form: pieces = the characters of
    // each normalized word, corpus order preserved.

    "d73_unigram_encode" ->
      """WITH toks AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS t FROM documents),
        |w AS (SELECT doc_id, i, t[i] AS w FROM toks, UNNEST(range(1, len(t)+1)) AS u(i) WHERE len(t[i]) > 0),
        |f AS (SELECT doc_id,
        |   flatten(array_agg(string_split_regex(w, '') ORDER BY i)) AS ps
        |  FROM w GROUP BY doc_id)
        |SELECT doc_id, CAST(len(ps) AS BIGINT) AS n_pieces,
        | substr(md5(array_to_string(ps, ' ')), 1, 8) AS pieces_md5
        |FROM f ORDER BY doc_id""".stripMargin,

    // Singles-only closed form: a word's pieces are its characters,
    // its unk pieces are its non-[a-z0-9] characters; the report is a
    // frequency-weighted character aggregate per lang.

    "d76_tokenizer_eval" ->
      """WITH toks AS (SELECT lang, string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS t FROM documents),
        |w AS (SELECT lang, t[i] AS w FROM toks, UNNEST(range(1, len(t)+1)) AS u(i) WHERE len(t[i]) > 0),
        |g AS (SELECT lang, w, count(*) AS wc FROM w GROUP BY 1, 2),
        |m AS (SELECT lang, wc, len(w) AS np,
        |   len(w) - length(regexp_replace(w, '[^a-z0-9]', '', 'g')) AS nu
        |  FROM g)
        |SELECT lang AS slice, CAST(sum(wc) AS BIGINT) AS n_words,
        | CAST(sum(wc * np) AS BIGINT) AS n_pieces,
        | round(CAST(sum(wc * np) AS DOUBLE) / sum(wc), 6) AS fertility,
        | CAST(1.0 AS DOUBLE) AS chars_per_piece,
        | CAST(sum(wc * nu) AS BIGINT) AS unk_pieces,
        | round(CAST(sum(wc * nu) AS DOUBLE) / sum(wc * np), 6) AS unk_share
        |FROM m GROUP BY 1 ORDER BY slice""".stripMargin,

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
        |FROM n ORDER BY doc_id""".stripMargin
  )
}
