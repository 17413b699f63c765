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


/** D-series TEXT-ANALYSIS driver queries (quality gates, language ID,
  * tokenization/BPE, corpus statistics, Gopher/C4 cleaning, lexical
  * fits) with their DuckDB oracles — split from the former monolithic
  * DataQueries registry; SparkEntry composes the union. */
private[graft] object TextQueries {

  /** The d47 boilerplate KEEP rule as a DuckDB lambda over one trimmed
    * non-empty line `l` — shared by the d47 oracle and StreamQueries'
    * e13 cleaned-ingest oracle so graft.text.Boilerplate's rule is
    * mirrored in exactly one place. */
  private[graft] val boilerplateKeepLambda: String =
    """l -> (
      |     len(list_filter(string_split_regex(lower(l), '\s+'), w -> regexp_matches(w, '[a-z0-9]'))) >= 4
      |     AND len(list_filter(list_filter(string_split_regex(lower(l), '\s+'), w -> regexp_matches(w, '[a-z0-9]')),
      |           w -> w IN ('the','be','to','of','and','that','have','with'))) * 1.0
      |         >= 0.08 * len(list_filter(string_split_regex(lower(l), '\s+'), w -> regexp_matches(w, '[a-z0-9]')))
      |     ) OR length(l) >= 200""".stripMargin

  /** Per-document Gopher QUALITY flags as a reusable CTE chain ending
    * in `qf(doc_id, source, ok_*, keep)` — the d41 rule set factored so
    * the d45 pipeline oracle (and StreamQueries' e13 cleaned-ingest
    * oracle, which runs the rules over boilerplate-CLEANED text) can
    * compose it. `src` is the table/CTE the rules read — it must
    * expose (doc_id, source, text). */
  private[graft] def gopherQualityCtes(src: String = "documents"): String =
    """qt AS (SELECT doc_id, source, text,
      |   string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS t FROM __SRC__),
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
      |  FROM qm)""".stripMargin.replace("__SRC__", src)
  /** The d42 oracle's CTE chain, generated per n (top n = 2..4, dup
    * n = 5..10) so the nine structurally-identical gram CTEs stay
    * maintainable, ending in per-document
    * `fl(doc_id, source, top2, dlcf, ok_*, keep)`.
    * Mirrors GopherRepetition exactly: empty tokens filtered before
    * shingling, per-doc gram counts via unnest+GROUP BY (the oracle may
    * explode; the engine must not), top tie-break = max chars among
    * max-count grams, duplicated chars = Σ c·len over grams with c ≥ 2,
    * denominators = greatest(normalized length, 1). */
  private[graft] def gopherRepetitionCtes(src: String = "documents"): String = {
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
       |   regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm FROM $src),
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
  private[graft] def d42Oracle: String =
    s"""WITH ${gopherRepetitionCtes()}
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
  private[graft] def d45Oracle: String =
    s"""WITH ${gopherQualityCtes()},
       |${gopherRepetitionCtes()},
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

  // lazy + declared before the local maps they merge: strict vals here
  // would read a not-yet-initialized localQueries (declaration order)
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    localQueries ++ TextQueries2.queries

  lazy val oracleSql: Map[String, String] =
    localOracleSql ++ TextQueries2.oracleSql

  private val localQueries: Map[String, (SparkSession, String) => DataFrame] = Map(


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

    "d16_tfidf" -> ((s, dir) => {
      TfIdf.topTerms(Tables.documents(s, dir), col("doc_id"), col("text"), k = 3)
        .orderBy("doc_id", "term")
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
  )

  private val localOracleSql: Map[String, String] = Map(


    "d22_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS w FROM documents)
        |SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
        | CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
        | round(CASE WHEN len(w) > 0 THEN 1.0 - CAST(len(list_distinct(w)) AS DOUBLE)/len(w) ELSE 0.0 END, 4) AS repetition
        |FROM t ORDER BY doc_id""".stripMargin,

    // Composes the established d1/d7/d8/d39 mirrors into one profile:
    // md5 fingerprints, the quality formula, the stopword-argmax
    // language ID, and the indexed-lambda stutter collapse.

    "d40_corpus_profile" ->
      """WITH t AS (SELECT source, text,
        |  string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS w,
        |  md5(regexp_replace(lower(trim(text)),'\s+',' ','g')) AS fp FROM documents),
        |h AS (SELECT source, fp, CAST(len(w) AS BIGINT) AS n_toks,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(w) - len(list_filter(w, (x, i) -> i = 1 OR x <> w[i-1])) AS BIGINT) AS stutter,
        |  least(1.0, len(w)/100.0)*0.5
        |    + (1 - least(CAST(length(regexp_replace(text, '[^.!?,;]', '', 'g')) AS DOUBLE)/length(text), 1.0))*0.3
        |    + (1 - least(CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)/length(text), 1.0))*0.2 AS q,
        |  len(list_filter(w, x -> x IN ('the','a','of','to','and','is','in','it'))) AS h_en,
        |  len(list_filter(w, x -> x IN ('der','die','das','und','ist','ein','nicht','zu'))) AS h_de,
        |  len(list_filter(w, x -> x IN ('el','la','de','los','que','y','un','es'))) AS h_es,
        |  len(list_filter(w, x -> x IN ('le','la','les','et','est','un','dans','que'))) AS h_fr
        | FROM t),
        |p AS (SELECT *, CASE
        |  WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr THEN 'en'
        |  WHEN h_de >= h_es AND h_de >= h_fr THEN 'de'
        |  WHEN h_es >= h_fr THEN 'es' ELSE 'fr' END AS lang FROM h)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        | CAST(sum(n_toks) AS BIGINT) AS n_tokens,
        | CAST(sum(n_chars) AS BIGINT) AS n_chars,
        | CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_exact_dup_docs,
        | CAST(sum(stutter) AS BIGINT) AS n_stutter_tokens,
        | round(avg(q), 4) AS avg_quality,
        | CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
        | CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS n_de,
        | CAST(sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS n_es,
        | CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS n_fr
        |FROM p""".stripMargin,

    // DuckDB list lambdas take the same optional 1-based index; i = 1
    // keeps the first element, i > 1 compares against w[i-1] exactly as
    // the Spark when/element_at formulation does

    "d39_stutter_collapse" ->
      """WITH t AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS w FROM documents),
        |k AS (SELECT doc_id, w, list_filter(w, (x, i) -> i = 1 OR x <> w[i-1]) AS kept FROM t)
        |SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
        | CAST(len(kept) AS BIGINT) AS n_kept,
        | substr(md5(array_to_string(kept, ' ')), 1, 8) AS clean_md5
        |FROM k ORDER BY doc_id""".stripMargin,

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
      s"""WITH ${gopherQualityCtes()}
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

    "d47_boilerplate_lines" ->
      ("""WITH t AS (SELECT doc_id,
        |   list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
        |     x -> length(x) > 0) AS lines FROM documents),
        |k AS (SELECT doc_id, lines,
        |   list_filter(lines, """.stripMargin + boilerplateKeepLambda + """) AS kept
        |  FROM t)
        |SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
        | CAST(len(kept) AS BIGINT) AS n_kept,
        | md5(coalesce(array_to_string(kept, chr(10)), '')) AS clean_md5
        |FROM k ORDER BY doc_id""".stripMargin),

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

    // Same normalize/split/3-gram/distinct/md5-60 derivation; novelty
    // recomputed per doc then averaged per source.
  )
}
