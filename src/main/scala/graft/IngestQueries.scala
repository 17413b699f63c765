package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A-series ingestion-governance driver rows — the round-12 promotion
  * wave continued: crypto-shredding (A24), incremental bookmarks
  * (A28), and write-audit-publish versioning (A29) graded through the
  * DuckDB gate instead of library-only specs. The pattern is the same
  * as LayoutQueries: drive the REAL library machinery against state
  * written in-query, and emit an observable surface that is a pure
  * function of the input tables (erasure flags from the forget rule,
  * tercile pull counts from the event-time range, version numbers from
  * the publish sequence) so the oracle recomputes it without seeing
  * the temp state. Crypto ciphertext is never compared (GCM IVs are
  * engine-drawn) — only the round-trip/erasure BOOLEANS, which are
  * deterministic guarantees of the design.
  */
object IngestQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A24 — crypto-shredding end-to-end: derive per-entity keys,
    // encrypt two PII columns, DELETE the key rows of every 7th
    // customer (the erasure), decrypt with the surviving key table.
    // Per customer: forgotten flag, and per-column booleans proving
    // (a) forgotten rows decrypt to NULL with their row intact —
    // erasure by key deletion, audit trail preserved — and (b) kept
    // rows round-trip to the exact original plaintext.
    "a24_forget" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      val keys = graft.etl.Forget.keyTable(cust, col("c_custkey"), "graft-master")
      val enc = graft.etl.Forget.encryptColumns(cust, col("c_custkey"), keys,
        Seq("c_name", "c_mktsegment"))
      val kept = keys.filter(pmod(col("entity").cast("long"), lit(7L)) =!= 0L)
      val dec = graft.etl.Forget.decryptColumns(enc, col("c_custkey"), kept,
        Seq("c_name", "c_mktsegment"))
        .select(col("c_custkey"), col("c_name").as("__n"),
          col("c_mktsegment").as("__m"), col("__forgotten"))
      dec.join(cust, Seq("c_custkey"))
        .select(col("c_custkey"), col("__forgotten").as("forgotten"),
          (when(col("__forgotten"), col("__n").isNull)
            .otherwise(col("__n") <=> col("c_name"))).as("name_ok"),
          (when(col("__forgotten"), col("__m").isNull)
            .otherwise(col("__m") <=> col("c_mktsegment"))).as("segment_ok"))
        .orderBy("c_custkey")
    }),

    // A28 — bookmark-driven incremental ingestion over a growing
    // source: three runs against the event stream cut at event-time
    // terciles; each run pulls STRICTLY past the persisted watermark,
    // lands, then advances. Pull counts + the advanced watermark
    // (micros) are pure functions of the event-time distribution; the
    // strict-> contract means max-ts ties land exactly once (run 1).
    "a28_bookmark" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.events(s, dir).filter(col("ts").isNotNull)
        .select(col("event_id"), col("ts"))
      val us = graft.operators.Relational.epochMicros(col("ts"))
      val mm = e.agg(min(us).as("lo"), max(us).as("hi")).head()
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val (c1, c2) = (lo + (hi - lo) / 3, lo + 2 * ((hi - lo) / 3))
      val bmPath = graft.sources.Tmp.dir("graft-a28").toString + "/bm"
      val arrivals = Seq(e.filter(us <= c1), e.filter(us <= c2), e)
      val rows = arrivals.zipWithIndex.map { case (src, i) =>
        val bm = graft.etl.Bookmark.read(s, bmPath)
        val delta = graft.etl.Bookmark.incrementalPull(src, col("ts"), bm)
        val n = delta.count() // "land the delta first"
        val advanced = graft.etl.Bookmark.advance(s, bmPath, delta, col("ts"))
        // micros = whole seconds + in-second nanos (getTime's ms part
        // is contained in getNanos — don't double-count it)
        val bmUs = advanced.map(t => t.getTime / 1000L * 1000000L + t.getNanos / 1000L).get
        (i + 1L, n, bmUs)
      }
      rows.toDF("run", "n_pulled", "bookmark_us").orderBy("run")
    }),

    // A29 — write-audit-publish: v1 (even keys) and v2 (full) publish
    // cleanly; v3 plants NULL priorities and its NotNull audit REJECTS
    // the staging dir (versions list must not grow); then an atomic
    // rollback re-points _LATEST at v1. Version numbers, the rejection,
    // and both row counts are the compared surface.
    "a29_publish" -> ((s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      val root = graft.sources.Tmp.dir("graft-a29").toString + "/pub"
      val v1 = graft.etl.Publish.publish(o.filter(pmod(col("o_orderkey"), lit(2L)) === 0L), root)
      val v2 = graft.etl.Publish.publish(o, root,
        Seq(graft.etl.Checks.NotNull("o_orderpriority")))
      val bad = o.withColumn("o_orderpriority",
        when(pmod(col("o_orderkey"), lit(5L)) === 0L, lit(null).cast("string"))
          .otherwise(col("o_orderpriority")))
      val rejected =
        try { graft.etl.Publish.publish(bad, root,
          Seq(graft.etl.Checks.NotNull("o_orderpriority"))); false }
        catch { case _: graft.etl.Publish.AuditFailedException => true }
      val nVersions = graft.etl.Publish.versions(s, root).size.toLong
      val rowsV2 = graft.etl.Publish.readVersion(s, root, v2).count()
      graft.etl.Publish.repoint(s, root, v1)
      val rowsLatest = graft.etl.Publish.readLatest(s, root).count()
      val current = graft.etl.Publish.currentVersion(s, root).getOrElse(-1L)
      Seq((nVersions, v1, v2, rejected, rowsV2, rowsLatest, current))
        .toDF("n_versions", "v1", "v2", "v3_rejected", "rows_v2",
          "rows_latest_after_rollback", "current_version")
    }),

    // A18 — HTTP fetch POLICY graded closed-form (the a26/a31
    // replay technique): the fetch itself needs a live network
    // (spec-covered by the in-process stub), but the retry/route/wait
    // decision table and the token-bucket admission schedule are
    // deterministic arithmetic, and `fetchOne` executes EXACTLY
    // `HttpFetch.waitMillis`/classification — so this row pins the
    // production policy, not a mirror. Per o_orderkey a 3-attempt
    // status sequence is synthesized from closed-form key arithmetic
    // (both engines derive byte-identical sequences; vocabulary covers
    // success, 429+Retry-After valid/invalid/absent, permanent
    // 401/403/404, retryable 5xx, and no-response), replayed through
    // the REAL policyTrace; admission delay is the REAL
    // admissionDelayMillis at each request's position within its host
    // queue (rate 2/s, burst 3). Narrow per-row work after one
    // host-partitioned window — scales linearly.
    "a18_fetch_policy" -> ((s, dir) => {
      import s.implicits._
      val vocab = Seq(200, 429, 500, 404, 503, 429, 401, 0, 502, 403)
      def st(i: Int) = element_at(
        array(vocab.map(lit): _*),
        (pmod(col("id") * 7 + lit(i * 13), lit(10L)) + 1).cast("int"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("host").orderBy("id")
      val in = Tables.orders(s, dir).select(col("o_orderkey").as("id"))
        .withColumn("host", pmod(col("id"), lit(97L)))
        .withColumn("pos", (row_number().over(w) - 1).cast("long"))
        .withColumn("s1", st(1)).withColumn("s2", st(2)).withColumn("s3", st(3))
        .withColumn("ra",
          when(pmod(col("id"), lit(3L)) === 0L,
            pmod(expr("id DIV 3"), lit(9L)).cast("string"))
            .when(pmod(col("id"), lit(3L)) === 1L, lit("soon"))
            .otherwise(lit(null).cast("string")))
      val p = graft.sources.HttpFetch.Policy(
        maxRetries = 3, backoffMillis = 2000L, maxWaitMillis = 3000L)
      in.select(col("id"), col("host"), col("pos"),
          col("s1"), col("s2"), col("s3"), col("ra"))
        .as[(Long, Long, Long, Int, Int, Int, String)]
        .map { case (id, host, pos, s1, s2, s3, ra) =>
          val t = graft.sources.HttpFetch.policyTrace(
            Seq(s1, s2, s3), Seq.fill(3)(Option(ra)), p)
          (id, host, pos, t.success, t.status, t.error, t.attempts,
            t.totalWaitMillis,
            graft.sources.HttpFetch.admissionDelayMillis(pos, 2.0, 3))
        }
        .toDF("id", "host", "pos", "success", "status", "error",
          "attempts", "wait_ms", "delay_ms")
        .orderBy("id")
    })
  )

  val oracleSql: Map[String, String] = Map(

    // Erasure rule and round-trip guarantees recomputed from the raw
    // customer table: forgotten iff custkey % 7 = 0; both per-column
    // booleans are TRUE by the design's contract (NULL-on-forget,
    // exact plaintext otherwise) and deterministic.
    "a24_forget" ->
      """SELECT c_custkey, c_custkey % 7 = 0 AS forgotten,
        | TRUE AS name_ok, TRUE AS segment_ok
        |FROM customer ORDER BY c_custkey""".stripMargin,

    // Tercile cuts in integer micros (Scala Long division ≡ //); run 2
    // and 3 pull strictly past the previous run's max-ts watermark.
    "a28_bookmark" ->
      """WITH b AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
        |  FROM events WHERE ts IS NOT NULL),
        |c AS (SELECT lo + (hi - lo) // 3 AS c1, lo + 2 * ((hi - lo) // 3) AS c2 FROM b),
        |u AS (SELECT epoch_us(ts) AS us FROM events WHERE ts IS NOT NULL),
        |m1 AS (SELECT max(us) AS bm FROM u, c WHERE us <= c1),
        |m2 AS (SELECT max(us) AS bm FROM u, c WHERE us <= c2)
        |SELECT * FROM (
        | SELECT CAST(1 AS BIGINT) AS run,
        |  (SELECT CAST(count(*) AS BIGINT) FROM u, c WHERE us <= c1) AS n_pulled,
        |  (SELECT bm FROM m1) AS bookmark_us
        | UNION ALL SELECT 2,
        |  (SELECT CAST(count(*) AS BIGINT) FROM u, c, m1 WHERE us > m1.bm AND us <= c2),
        |  (SELECT bm FROM m2)
        | UNION ALL SELECT 3,
        |  (SELECT CAST(count(*) AS BIGINT) FROM u, m2 WHERE us > m2.bm),
        |  (SELECT max(us) FROM u)
        |) ORDER BY run""".stripMargin,

    // The publish sequence is closed-form: two committed versions, the
    // audited third rejected, rollback re-points at v1.
    "a29_publish" ->
      """SELECT CAST(2 AS BIGINT) AS n_versions, CAST(1 AS BIGINT) AS v1,
        | CAST(2 AS BIGINT) AS v2, TRUE AS v3_rejected,
        | (SELECT CAST(count(*) AS BIGINT) FROM orders) AS rows_v2,
        | (SELECT CAST(count(*) AS BIGINT) FROM orders WHERE o_orderkey % 2 = 0)
        |   AS rows_latest_after_rollback,
        | CAST(1 AS BIGINT) AS current_version""".stripMargin,

    // Closed-form replay of the fetch decision table: statuses from
    // the same key arithmetic, routes S(uccess)/P(ermanent)/R(etryable),
    // waits = Retry-After honored-and-capped on parseable 429s else
    // capped exponential backoff (2000, then 3000 at the 3000 ms cap),
    // status = LAST response seen (no-response attempts leave it),
    // admission = max(0, (pos - burst + 1)/rate) at rate 2/s burst 3.
    "a18_fetch_policy" ->
      """WITH base AS (SELECT o_orderkey AS id FROM orders),
        |pos AS (SELECT id, id % 97 AS host,
        |  CAST(row_number() OVER (PARTITION BY id % 97 ORDER BY id) - 1 AS BIGINT) AS pos
        |  FROM base),
        |seq AS (SELECT id, host, pos,
        |  ([200,429,500,404,503,429,401,0,502,403])[CAST((id*7 + 13) % 10 AS INT) + 1] AS s1,
        |  ([200,429,500,404,503,429,401,0,502,403])[CAST((id*7 + 26) % 10 AS INT) + 1] AS s2,
        |  ([200,429,500,404,503,429,401,0,502,403])[CAST((id*7 + 39) % 10 AS INT) + 1] AS s3,
        |  CASE WHEN id % 3 = 0 THEN CAST((id // 3) % 9 AS VARCHAR)
        |       WHEN id % 3 = 1 THEN 'soon' ELSE NULL END AS ra
        |  FROM pos),
        |cls AS (SELECT *,
        |  CASE WHEN s1 = 200 THEN 'S' WHEN s1 IN (401,403,404) THEN 'P' ELSE 'R' END AS c1,
        |  CASE WHEN s2 = 200 THEN 'S' WHEN s2 IN (401,403,404) THEN 'P' ELSE 'R' END AS c2,
        |  CASE WHEN s3 = 200 THEN 'S' WHEN s3 IN (401,403,404) THEN 'P' ELSE 'R' END AS c3,
        |  CASE WHEN s1 = 429 AND TRY_CAST(trim(ra) AS BIGINT) IS NOT NULL
        |       THEN greatest(0, least(TRY_CAST(trim(ra) AS BIGINT) * 1000, 3000))
        |       ELSE 2000 END AS w1,
        |  CASE WHEN s2 = 429 AND TRY_CAST(trim(ra) AS BIGINT) IS NOT NULL
        |       THEN greatest(0, least(TRY_CAST(trim(ra) AS BIGINT) * 1000, 3000))
        |       ELSE 3000 END AS w2
        |  FROM seq),
        |term AS (SELECT *,
        |  CASE WHEN c1 <> 'R' THEN 1 WHEN c2 <> 'R' THEN 2 ELSE 3 END AS att
        |  FROM cls)
        |SELECT id, host, pos,
        |  CASE att WHEN 1 THEN s1 = 200 WHEN 2 THEN s2 = 200 ELSE s3 = 200 END AS success,
        |  CAST(CASE WHEN att = 1 THEN s1 WHEN att = 2 THEN s2
        |    WHEN s3 > 0 THEN s3 WHEN s2 > 0 THEN s2 WHEN s1 > 0 THEN s1
        |    ELSE NULL END AS INTEGER) AS status,
        |  CASE WHEN att = 1 AND c1 = 'P' THEN 'HTTP_' || s1
        |       WHEN att = 2 AND c2 = 'P' THEN 'HTTP_' || s2
        |       WHEN att = 3 AND c3 = 'P' THEN 'HTTP_' || s3
        |       WHEN att = 3 AND c3 = 'R' THEN 'MAX_RETRIES_EXCEEDED'
        |       ELSE NULL END AS error,
        |  CAST(att AS INTEGER) AS attempts,
        |  CAST(CASE att WHEN 1 THEN 0 WHEN 2 THEN w1 ELSE w1 + w2 END AS BIGINT) AS wait_ms,
        |  CAST(greatest(0, (pos - 2) * 500) AS BIGINT) AS delay_ms
        |FROM term ORDER BY id""".stripMargin
  )
}
