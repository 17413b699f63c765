package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** C-series layout/index driver rows — the read-side of the file-layout
  * components (C24 manifest min/max skipping, C40 Bloom sidecar point
  * lookups, C38 dynamic partition pruning), graded as driver-oracle
  * rows instead of library-only specs. Each query WRITES its layout
  * in-query (fresh temp dir — the c12 in-query-write pattern), drives
  * the real pruning machinery over it, and emits the pruning DECISION
  * as the compared surface. The decision is a pure function of the
  * table data (bucket boundaries are closed-form, partition values are
  * derived columns), so DuckDB recomputes the expected survivor set
  * from the same parquet inputs without ever seeing the temp layout.
  *
  * 100-TB relevance: these three are exactly the mechanisms that turn
  * "scan 800k files" into "open a handful" — manifest range skipping
  * for sorted/clustered layouts, Bloom sidecars for unsorted
  * high-cardinality point lookups, DPP for star-join date filters. The
  * graded rows pin that each one PRUNES (not just returns correct
  * rows): c24 compares per-file survivorship, c40 compares
  * no-false-negative hits with an FP budget, c38 compares the runtime
  * partition count Spark's own scan metrics report.
  */
object LayoutQueries {

  /** Executed-plan walk for the fact scan under `path` (unwraps AQE
    * wrapper nodes) — the ONE shared walker: c38/c65's compared
    * surface reads the scan's own numFiles metric through it, and
    * DppSpec asserts its pruning contracts through the same code so a
    * future Spark-upgrade wrapper node can't split their verdicts. */
  private[graft] def factScans(p: SparkPlan, path: String): Seq[FileSourceScanExec] = {
    def walk(n: SparkPlan): Seq[FileSourceScanExec] = n match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case s: FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains(path)) => Seq(s)
      case other => (other.children ++ other.subqueries).flatMap(walk)
    }
    walk(p)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // C24: range-bucketed layout (8 closed-form o_orderkey buckets,
    // one file each) → footer-stats manifest → candidateFiles for the
    // predicate o_orderkey ∈ [2w, 3w]. Compared surface: per-file
    // (n_rows, min, max, survives) where `survives` comes from the
    // REAL candidateFiles call, not a reimplementation of its
    // predicate. The oracle recomputes bounds + survivorship from the
    // same closed-form bucketing over the raw table.
    "c24_manifest_prune" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_orderkey"))
      val maxKey = o.agg(max("o_orderkey")).head().getLong(0)
      val w = maxKey / 8 + 1 // ceil-ish width: buckets 0..7 cover [0, maxKey]
      val tmp = graft.sources.Tmp.dir("graft-c24").toString
      o.withColumn("file_id", expr(s"o_orderkey DIV $w"))
        .repartition(col("file_id")) // all rows of a bucket in one task → one file per dir
        .write.mode("overwrite").partitionBy("file_id").parquet(tmp)
      val m = graft.sources.Manifest.build(s, tmp, Seq("o_orderkey")).cache()
      val lo = (2 * w).toDouble
      val hi = (3 * w).toDouble
      val kept = graft.sources.Manifest.candidateFiles(m, "o_orderkey", lo, hi)
      m.select(
          regexp_extract(col("file"), "file_id=(\\d+)", 1).cast("long").as("bucket"),
          col("n_rows"),
          col("min_val").cast("long").as("min_key"),
          col("max_val").cast("long").as("max_key"),
          col("file").isin(kept: _*).as("survives"))
        .orderBy("bucket")
    }),

    // C40: doc_id%6 file layout → per-file Bloom sidecar → batch point
    // lookups through the REAL candidateFiles + prunedRead path.
    // Compared surface per probe: presence, rows actually returned by
    // the pruned read (no-false-negative: must equal the raw count),
    // and two FP-bound booleans pinned TRUE (the c8b technique — the
    // sidecar's exact candidate set is implementation-defined, its
    // guarantees aren't): the true file is always a candidate, and
    // false positives stay within budget (≤2 of the 5 other files at
    // fpp=0.01 — expected 0.05).
    "c40_bloom_hits" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir).select(col("doc_id"))
      val probes = Seq(7L, 123L, 256L, 401L, 499L, 1000003L, 5000011L, 7777777L)
      val tmp = graft.sources.Tmp.dir("graft-c40").toString
      docs.withColumn("file_id", pmod(col("doc_id"), lit(6L)))
        .repartition(col("file_id"))
        .write.mode("overwrite").partitionBy("file_id").parquet(tmp)
      val nDocs = docs.count()
      val idx = graft.sources.BloomIndex.build(s, tmp, "doc_id",
        expectedPerFile = math.max(1000L, nDocs / 6 * 2), fpp = 0.01).cache()
      val presentSet = docs.filter(col("doc_id").isin(probes: _*))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // one sidecar collect per probe — candidateFiles feeds BOTH the
      // meta booleans and the pruned read (the paths overload)
      val candsByProbe = probes.map(v =>
        v -> graft.sources.BloomIndex.candidateFiles(idx, v.toString)).toMap
      val meta = probes.map { v =>
        val cands = candsByProbe(v)
        val present = presentSet(v)
        val trueHit = !present || cands.exists(_.contains(s"file_id=${v % 6}"))
        val fpOk = (cands.size - (if (present) 1 else 0)) <= 2
        (v, present, trueHit, fpOk)
      }.toDF("probe", "present", "true_file_hit", "fp_within_bound")
      val found = probes.map { v =>
        graft.sources.BloomIndex.prunedRead(s, tmp, "doc_id", v.toString, candsByProbe(v))
          .select(lit(v).as("probe"))
      }.reduce(_ unionAll _).groupBy("probe").agg(count(lit(1)).as("rows_found"))
      meta.join(found, Seq("probe"), "left")
        .select(col("probe"), col("present"),
          coalesce(col("rows_found"), lit(0L)).as("rows_found"),
          col("true_file_hit"), col("fp_within_bound"))
        .orderBy("probe")
    }),

    // C38: day-partitioned fact layout (day = o_orderkey % 10, one
    // file per partition) joined with a FILTERED file-source dim —
    // Spark must inject the dim's surviving day set as a runtime
    // dynamicpruning subquery into the fact scan. Compared surface:
    // the scan's OWN numFiles metric (= partitions read, one file
    // each) against the oracle's pure-function-of-the-filter partition
    // count, plus the join cardinality. A DPP regression reads 10
    // files instead of 3 and the row hash-mismatches.
    "c38_dpp_prune" -> ((s, dir) => {
      import s.implicits._
      val fact = Tables.orders(s, dir)
        .select(col("o_orderkey"), pmod(col("o_orderkey"), lit(10L)).cast("int").as("day"))
      val tmpFact = graft.sources.Tmp.dir("graft-c38-fact").toString
      val tmpDim = graft.sources.Tmp.dir("graft-c38-dim").toString
      fact.repartition(col("day"))
        .write.mode("overwrite").partitionBy("day").parquet(tmpFact)
      // dim must be a FILE source: a local relation's filter constant-
      // folds away and DPP's selective-predicate check sees no Filter
      fact.select(col("day")).distinct()
        .withColumn("tag", when(col("day") < 3, "keep").otherwise("drop"))
        .write.mode("overwrite").parquet(tmpDim)
      val f = s.read.parquet(tmpFact)
      val d = s.read.parquet(tmpDim).filter(col("tag") === "keep")
      val joined = f.join(d, Seq("day"))
      // execute THIS DataFrame's own physical plan (count() would wrap
      // it in a fresh QueryExecution whose scan metrics never populate)
      val rowsJoined = joined.queryExecution.toRdd.count()
      val plan = joined.queryExecution.executedPlan
      val dppApplied = plan.toString.contains("dynamicpruning")
      val partsRead = factScans(plan, tmpFact)
        .headOption.map(_.metrics("numFiles").value).getOrElse(-1L)
      val partsTotal = s.read.parquet(tmpFact).select("day").distinct().count()
      Seq((partsTotal, partsRead, rowsJoined, dppApplied))
        .toDF("parts_total", "parts_read", "rows_joined", "dpp_applied")
    }),

    // C65 — the composed 100-TB READ PATH, end-to-end as one graded
    // row: A27 partitioned write (day × custkey-bucket layout, one
    // file per leaf) → C24 manifest range skip on the UNSORTED data
    // column (footer stats, not dir names) → C40 Bloom point-lookup
    // skip → C38 DPP day-prune at runtime — with the files-read
    // accounting at every stage as the compared surface. The probe key
    // is itself a pure function of the data (min o_orderkey whose
    // custkey falls in bucket 2), so the oracle derives the whole
    // expected funnel from the raw table: 40 files listed → 10 after
    // the manifest (bucket 2 of each day) → Bloom candidates
    // bound-pinned (c8b) → DPP reads only day probe%10 → exactly one
    // row out. At 800k files this funnel is the difference between a
    // full listing+footer pass and opening a handful of files.
    "c65_read_path" -> ((s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
      val maxCust = o.agg(max("o_custkey")).head().getLong(0)
      val wc = maxCust / 4 + 1
      val tmp = graft.sources.Tmp.dir("graft-c65").toString
      val tmpDim = graft.sources.Tmp.dir("graft-c65-dim").toString
      graft.sources.PartitionedSink.overwritePartitions(
        o.withColumn("day", pmod(col("o_orderkey"), lit(10L)).cast("int"))
          .withColumn("bkt", expr(s"o_custkey DIV $wc").cast("int")),
        tmp, Seq("day", "bkt"))
      // probe key: data-derived, guaranteed to live in a bucket-2 file
      val probeKey = o.filter(expr(s"o_custkey DIV $wc") === 2)
        .agg(min("o_orderkey")).head().getLong(0)
      val probeDay = probeKey % 10
      val manifest = graft.sources.Manifest.build(s, tmp, Seq("o_custkey")).cache()
      val filesTotal = manifest.select("file").distinct().count()
      val manifestKept = graft.sources.Manifest.candidateFiles(
        manifest, "o_custkey", (2 * wc).toDouble, (3 * wc - 1).toDouble)
      val nRows = o.count()
      val bloom = graft.sources.BloomIndex.build(s, tmp, "o_orderkey",
        expectedPerFile = math.max(1000L, nRows / filesTotal * 2), fpp = 0.01).cache()
      // Manifest paths are Hadoop-form (file:/tmp/…), Bloom paths come
      // from input_file_name() (file:///tmp/…) — normalize to plain
      // paths before intersecting or the funnel silently empties
      def norm(p: String): String = new org.apache.hadoop.fs.Path(p).toUri.getPath
      val bloomCands = graft.sources.BloomIndex.candidateFiles(bloom, probeKey.toString)
        .map(norm)
      val finalCands = manifestKept.map(norm).filter(bloomCands.toSet)
      val trueFileHit = finalCands.exists(p =>
        p.contains(s"day=$probeDay") && p.contains("bkt=2"))
      // FP budget: the true file plus <=3 of the other 39 at fpp=0.01
      val bloomOk = trueFileHit && (bloomCands.size <= 4)
      // dim written as a FILE source so the day filter survives to DPP
      s.read.parquet(tmp).select(col("day")).distinct()
        .withColumn("tag", when(col("day") === probeDay, "keep").otherwise("drop"))
        .write.mode("overwrite").parquet(tmpDim)
      val dimKeep = s.read.parquet(tmpDim).filter(col("tag") === "keep")
      val read = s.read.option("basePath", tmp).parquet(finalCands: _*)
        .join(dimKeep, Seq("day"))
        .filter(col("o_orderkey") === probeKey)
      val rowsFinal = read.queryExecution.toRdd.count()
      val plan = read.queryExecution.executedPlan
      val dppApplied = plan.toString.contains("dynamicpruning")
      val filesRead = factScans(plan, tmp)
        .headOption.map(_.metrics("numFiles").value).getOrElse(-1L)
      val inDayBound = finalCands.count(_.contains(s"day=$probeDay"))
      val readOk = filesRead >= 1 && filesRead <= inDayBound
      Seq((probeKey, filesTotal, manifestKept.size.toLong, bloomOk,
          dppApplied, readOk, rowsFinal))
        .toDF("probe_key", "files_total", "files_manifest", "bloom_ok",
          "dpp_applied", "read_within_bound", "rows_final")
    }),

    // A13 — declared-schema JSON/CSV/ORC ingestion graded end-to-end:
    // orders written to all three text/columnar formats in-query, read
    // back through the REAL Tables.readJson/readCsv/readOrc (declared
    // StructType, FAILFAST — no inference pass, the A13 contract), and
    // compared to the parquet source row-for-row via two-sided
    // exceptAll. roundtrip_exact pins the full fidelity claim: doubles
    // survive text formatting (Java toString round-trips), timestamps
    // survive the ISO pattern under the session's pinned UTC, nulls
    // and quoting survive CSV. A lossy format path (locale-dependent
    // formatting, inference drift, tz skew) flips the boolean and
    // hash-mismatches.
    "a13_multiformat" -> ((s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
      val tmp = graft.sources.Tmp.dir("graft-a13").toString
      o.write.mode("overwrite").json(s"$tmp/j")
      o.write.mode("overwrite").option("header", "true").csv(s"$tmp/c")
      o.write.mode("overwrite").orc(s"$tmp/o")
      val reads = Seq(
        "csv" -> Tables.readCsv(s, s"$tmp/c", o.schema),
        "json" -> Tables.readJson(s, s"$tmp/j", o.schema),
        "orc" -> Tables.readOrc(s, s"$tmp/o", o.schema))
      reads.map { case (fmt, df) =>
        val back = df.select(o.columns.map(col): _*)
        val exact = back.exceptAll(o).isEmpty && o.exceptAll(back).isEmpty
        val agg = back.agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sk")).head()
        (fmt, agg.getLong(0), exact, agg.getLong(1))
      }.toDF("format", "n_rows", "roundtrip_exact", "sum_key")
        .orderBy("format")
    }),

    // C17 promoted: the Morton-interleave math is graded row-exact
    // (every order's 16-bit z-value from two 8-bit dims, recomputed by
    // the oracle with SQL bit arithmetic), and the LAYOUT contract
    // rides every row as one boolean: writeZOrdered produced exactly
    // nFiles files whose z-ranges are pairwise non-overlapping when
    // ordered (range partition + in-file sort ⇒ parquet min/max stats
    // prune 2-D boxes) and the read-back carries every source row.
    // The lag window runs over the 8-row per-file stats table (the
    // liftTable bounded class); the 1-row flag broadcast is the d5
    // bounded-sweep class.
    "c17_zorder_layout" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val base = Tables.orders(s, dir).select(col("o_orderkey"),
        pmod(col("o_orderkey"), lit(256L)).as("zx"),
        pmod(col("o_custkey"), lit(256L)).as("zy"))
      val z = graft.sources.Zorder.zValue(Seq(col("zx"), col("zy")), bits = 8)
      val tmp = graft.sources.Tmp.dir("graft-c17").toString
      graft.sources.Zorder.writeZOrdered(base, tmp, z, nFiles = 8)
      val nBase = base.count()
      val stats = s.read.parquet(tmp)
        .withColumn("__z", graft.sources.Zorder.zValue(Seq(col("zx"), col("zy")), 8))
        .groupBy(input_file_name().as("__f"))
        .agg(min("__z").as("__mn"), max("__z").as("__mx"), count(lit(1)).as("__n"))
      val flag = stats
        .withColumn("__pmx", lag("__mx", 1).over(Window.orderBy("__mn")))
        .agg((count(lit(1)) === 8 && sum("__n") === nBase &&
          min(when(col("__pmx").isNull || col("__pmx") <= col("__mn"), 1)
            .otherwise(0)) === 1).as("layout_ok"))
      base.select(col("o_orderkey"), z.as("zval"))
        .crossJoin(broadcast(flag))
        .orderBy("o_orderkey")
    }),

    // C19 promoted: small-file compaction graded on its invariants —
    // a 40-sliver layout written in-query, compacted under a
    // targetBytes large enough that the byte-driven plan is
    // deterministically ONE file at any graded sf, with full row
    // parity (two-sided exceptAll) and exact count/sum recomputed by
    // the oracle from the raw table. A rewrite that drops or
    // duplicates rows, or leaves the sliver layout in place, breaks
    // an exact compared cell (the byte-dependent multi-file split at
    // production targetBytes stays spec-covered: output bytes are an
    // engine encoding property no SQL oracle can recompute).
    "c19_compaction" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.Compaction
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
      val in = graft.sources.Tmp.dir("graft-c19-in").toString
      val out = graft.sources.Tmp.dir("graft-c19-out").toString
      o.repartition(40).write.mode("overwrite").parquet(in)
      val st = Compaction.compactDir(s, in, out, targetBytes = 1L << 30)
      val back = s.read.parquet(out)
      val parity = back.exceptAll(o).isEmpty && o.exceptAll(back).isEmpty
      val agg = back.agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sk")).head()
      Seq((agg.getLong(0), agg.getLong(1), st.filesBefore, st.filesAfter, parity))
        .toDF("n_rows", "sum_key", "files_before", "files_after", "data_parity")
    })
  )

  val oracleSql: Map[String, String] = Map(

    // Per-format identity: the read-back must carry exactly the source
    // rows, so every compared value derives from the parquet table;
    // roundtrip_exact is deterministic (a lossy path flips it).
    "a13_multiformat" ->
      """WITH f(format) AS (VALUES ('csv'), ('json'), ('orc'))
        |SELECT format,
        | (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_rows,
        | TRUE AS roundtrip_exact,
        | (SELECT CAST(sum(o_orderkey) AS BIGINT) FROM orders) AS sum_key
        |FROM f ORDER BY format""".stripMargin,

    // Same closed-form bucketing (w = max//8 + 1), bounds from the raw
    // rows (= parquet footer stats for a lossless int64→double column),
    // same interval-disjointness survivorship as candidateFiles.
    "c24_manifest_prune" ->
      """WITH p AS (SELECT max(o_orderkey) // 8 + 1 AS w FROM orders),
        |b AS (SELECT o_orderkey // p.w AS bucket, o_orderkey, p.w FROM orders, p),
        |m AS (SELECT bucket, max(w) AS w, count(*) AS n_rows,
        |   min(o_orderkey) AS mn, max(o_orderkey) AS mx FROM b GROUP BY 1)
        |SELECT bucket, n_rows, mn AS min_key, mx AS max_key,
        | NOT (mx < 2 * w OR mn > 3 * w) AS survives
        |FROM m ORDER BY bucket""".stripMargin,

    // Presence + row counts from the raw table; the two Bloom
    // guarantees are pinned TRUE (no false negatives by construction,
    // FP count within budget at fpp=0.01 — the c8b bound-pinning
    // technique for sketch surfaces DuckDB can't bit-replay).
    "c40_bloom_hits" ->
      """WITH probes(probe) AS (VALUES (7), (123), (256), (401), (499),
        |  (1000003), (5000011), (7777777)),
        |c AS (SELECT doc_id, count(*) AS n FROM documents GROUP BY 1)
        |SELECT CAST(p.probe AS BIGINT) AS probe,
        | coalesce(c.n, 0) > 0 AS present,
        | CAST(coalesce(c.n, 0) AS BIGINT) AS rows_found,
        | TRUE AS true_file_hit, TRUE AS fp_within_bound
        |FROM probes p LEFT JOIN c ON c.doc_id = p.probe
        |ORDER BY probe""".stripMargin,

    // The whole expected funnel from the raw rows: leaf count, the
    // bucket-2 manifest survivors, the derived probe key, and the
    // final row count; the Bloom/DPP stages ride bound-pinned booleans
    // (their exact candidate sets are sketch-/runtime-defined).
    "c65_read_path" ->
      """WITH p AS (SELECT max(o_custkey) // 4 + 1 AS wc FROM orders),
        |f AS (SELECT DISTINCT o_orderkey % 10 AS day, o_custkey // p.wc AS bkt
        |  FROM orders, p),
        |k AS (SELECT min(o_orderkey) AS pk FROM orders, p WHERE o_custkey // p.wc = 2)
        |SELECT (SELECT pk FROM k) AS probe_key,
        | (SELECT CAST(count(*) AS BIGINT) FROM f) AS files_total,
        | (SELECT CAST(count(*) AS BIGINT) FROM f WHERE bkt = 2) AS files_manifest,
        | TRUE AS bloom_ok, TRUE AS dpp_applied, TRUE AS read_within_bound,
        | (SELECT CAST(count(*) AS BIGINT) FROM orders, k
        |    WHERE o_orderkey = k.pk) AS rows_final""".stripMargin,

    // The expected partition set is a pure function of the dim filter
    // (day < 3); parts_read must equal its size — if Spark's runtime
    // pruning regressed to a full scan, the Spark side reports 10.
    "c38_dpp_prune" ->
      """SELECT CAST(count(DISTINCT o_orderkey % 10) AS BIGINT) AS parts_total,
        | CAST(count(DISTINCT CASE WHEN o_orderkey % 10 < 3
        |   THEN o_orderkey % 10 END) AS BIGINT) AS parts_read,
        | CAST(sum(CASE WHEN o_orderkey % 10 < 3 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS rows_joined,
        | TRUE AS dpp_applied
        |FROM orders""".stripMargin,

    // Bit-for-bit Morton mirror: column j's bit i lands at position
    // i*2+j (zx is j=0, zy is j=1); layout_ok is the engine-side
    // pinned invariant (file count, disjoint z-ranges, row parity).
    "c17_zorder_layout" -> {
      val terms = (0 until 8).flatMap(i => Seq(
        s"((zx >> $i) & 1) * ${1L << (2 * i)}",
        s"((zy >> $i) & 1) * ${1L << (2 * i + 1)}")).mkString(" + ")
      s"""WITH b AS (SELECT o_orderkey, o_orderkey % 256 AS zx,
         |  o_custkey % 256 AS zy FROM orders)
         |SELECT o_orderkey, CAST($terms AS BIGINT) AS zval, TRUE AS layout_ok
         |FROM b ORDER BY o_orderkey""".stripMargin
    },

    // Exact count/sum from the raw table; the layout cells are the
    // engine-side pinned plan (40 slivers in, deterministically one
    // file out under the oversized target).
    "c19_compaction" ->
      """SELECT count(*) AS n_rows,
        | CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
        | CAST(40 AS BIGINT) AS files_before,
        | CAST(1 AS BIGINT) AS files_after,
        | TRUE AS data_parity
        |FROM orders""".stripMargin
  )
}
