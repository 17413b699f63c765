package graft

import graft.operators.Relational
import graft.streaming.StreamOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E-series driver rows, second file (e1-e7 core streaming drives,
  * alerting/session operators, and the ingest composites e10/e10b/
  * e13/e21-e23/e27/e29/e30/e34/e35) — split from [[StreamQueries]]
  * along the registry midpoint purely for file size; the drive
  * equivalence disciplines (tercile splits, sentinel flushes, canary
  * rows) are documented on [[StreamQueries]] and [[StreamDrive]].
  * [[StreamQueries]] merges `rawQueries`/`oracleSql` from here into
  * the single surface SparkEntry exposes; the machinery-bound
  * low-shuffle override is applied there over the merged map.
  */
private[graft] object StreamQueries2 {

  import StreamDrive._

  private[graft] val rawQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "e30_ohlc_bars" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .filter(col("ts").isNotNull)
        .select(col("event_id"), col("event_type"), col("ts"), col("value"))
      val in = tmp("graft_e30in"); val ck = tmp("graft_e30ck")
      (0 to 2).foreach { ep =>
        e.filter(pmod(coalesce(col("event_id"), lit(0L)), lit(3)) === ep)
          .coalesce(1).write.mode("append").parquet(in)
      }
      val stream = s.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
      val bars = StreamOps.streamingOhlcBars(stream, ts = "ts",
        watermark = "0 seconds", bucket = "1 day", groupCol = "event_type",
        valueCol = "value", tieBreak = Seq("event_id"))
      val name = "graft_e30_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = bars.writeStream.outputMode("complete").format("memory")
        .queryName(name).option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(name)
        .select(col("event_type"), col("bucket_start"),
          round(col("open"), 4).as("open"), round(col("high"), 4).as("high"),
          round(col("low"), 4).as("low"), round(col("close"), 4).as("close"),
          col("volume"))
        .orderBy("event_type", "bucket_start")
    }),

    // E27 — streaming CEP sequence matching through the REAL
    // flatMapGroupsWithState machinery: a file-source stream (3
    // event-time-tercile micro-batches plus two far-future sentinel
    // batches that advance the watermark so every buffered symbol
    // graduates), append-mode memory sink. Per-user match totals must
    // equal the batch regex count over the full ordered history
    // (timestamps second-truncated on BOTH engines so the operator's
    // millisecond-grain (ts, symbol) graduation order is replayable).

    "e27_seq_match" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.events(s, dir)
        .filter(col("user_id").isNotNull && col("ts").isNotNull &&
          col("event_type").isNotNull)
        .select(col("user_id"), date_trunc("second", col("ts")).as("ts"),
          col("event_type"))
      val us = Relational.epochMicros(col("ts"))
      val (c1, c2) = terciles(e)
      val in = tmp("graft_e27in"); val ck = tmp("graft_e27ck")
      val files = Seq(
        e.filter(us <= c1), e.filter(us > c1 && us <= c2), e.filter(us > c2),
        Seq((-1L, java.sql.Timestamp.valueOf("2150-01-01 00:00:00"), "flush1"))
          .toDF("user_id", "ts", "event_type"),
        Seq((-2L, java.sql.Timestamp.valueOf("2200-01-01 00:00:00"), "flush2"))
          .toDF("user_id", "ts", "event_type"))
      files.zipWithIndex.foreach { case (df, i) =>
        df.coalesce(1).write.mode("append").parquet(in)
        // distinct ascending mtimes pin the file-source batch order
        val d = new java.io.File(in)
        d.listFiles().filter(_.getName.startsWith("part-"))
          .sortBy(_.lastModified()).zipWithIndex.foreach { case (f, j) =>
            f.setLastModified(1700000000000L + j * 10000L)
          }
      }
      val stream = s.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
        .as[StreamOps.TypedEvent]
      val matches = StreamOps.sequenceMatches(s, stream,
        watermark = "0 seconds",
        symbols = Map("signup" -> "s", "view" -> "v", "click" -> "c",
          "purchase" -> "p", "error" -> "e"),
        pattern = "s[vc]*p", maxTail = 1 << 20)
      val name = "graft_e27_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = matches.toDF().writeStream.outputMode("append").format("memory")
        .queryName(name).option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(name)
        .groupBy("user_id")
        .agg(sum(col("n_new_matches")).as("total_matches"))
        .orderBy("user_id")
    }),

    // E1 — watermarked tumbling-window aggregation through the REAL
    // streaming machinery (file source, complete-mode memory sink):
    // per-(day, type) counts/sums folded incrementally over 3
    // key-split micro-batches must equal the one-shot batch aggregate.
    // Complete mode retains all window state, so the modulus split
    // order is immaterial — the e30 discipline.

    "e1_windowed_agg" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .filter(col("ts").isNotNull && col("event_type").isNotNull &&
          col("event_id").isNotNull)
        .select(col("event_id"), col("event_type"), col("ts"), col("value"))
      val in = tmp("graft_e1in"); val ck = tmp("graft_e1ck")
      (0 to 2).foreach { ep =>
        e.filter(pmod(col("event_id"), lit(3)) === ep)
          .coalesce(1).write.mode("append").parquet(in)
      }
      val stream = s.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
      val agg = StreamOps.windowedAgg(stream, ts = "ts",
        watermark = "0 seconds", bucket = "1 day", groupCol = "event_type",
        valueCol = "value")
      val name = "graft_e1_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = agg.writeStream.outputMode("complete").format("memory")
        .queryName(name).option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(name)
        .select(col("bucket_start"), col("event_type"), col("n"),
          round(col("sum_value"), 4).as("sum_value"))
        .orderBy("bucket_start", "event_type")
    }),

    // E2 — stateful gap sessionization through the REAL
    // flatMapGroupsWithState machinery: event-time tercile batches so
    // arrival order = event-time order (state merges forward only),
    // two far-future sentinel batches advance the watermark so every
    // open session times out and emits (the e27 flush discipline).
    // Oracle: the batch C10 gap rule over the full ordered history.

    "e2_sessionize" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.events(s, dir)
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), date_trunc("second", col("ts")).as("ts"),
          coalesce(col("value"), lit(0.0)).as("value"))
      val us = Relational.epochMicros(col("ts"))
      val (c1, c2) = terciles(e)
      val in = tmp("graft_e2in"); val ck = tmp("graft_e2ck")
      val files = Seq(
        e.filter(us <= c1), e.filter(us > c1 && us <= c2), e.filter(us > c2),
        Seq((-1L, java.sql.Timestamp.valueOf("2150-01-01 00:00:00"), 0.0))
          .toDF("user_id", "ts", "value"),
        Seq((-2L, java.sql.Timestamp.valueOf("2200-01-01 00:00:00"), 0.0))
          .toDF("user_id", "ts", "value"))
      files.foreach { df => pinOrdered(df, in) }
      val stream = s.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
        .as[StreamOps.SessionEvent]
      val sessions = StreamOps.sessionize(s, stream,
        watermark = "0 seconds", gapSeconds = 1800)
      val name = "graft_e2_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = sessions.toDF().writeStream.outputMode("append").format("memory")
        .queryName(name).option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(name).filter(col("user_id") >= 0)
        .select(col("user_id"), col("n_events"), col("duration_sec"),
          round(col("sum_value"), 4).as("sum_value"))
        .orderBy("user_id", "n_events", "duration_sec", "sum_value")
    }),

    // E3 — stream–static broadcast enrichment: each micro-batch joins
    // the live stream against the customer dimension (key synthesized
    // as user_id mod |dim| so the FK binds); append sink, no state.

    "e3_enrich_join" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      val nCust = cust.count() // static dim cardinality — bounded
      val e = Tables.events(s, dir)
        .filter(col("event_id").isNotNull && col("user_id").isNotNull)
        .select(col("event_id"), pmod(col("user_id"), lit(nCust)).as("c_custkey"))
      val in = tmp("graft_e3in"); val ck = tmp("graft_e3ck")
      (0 to 2).foreach { ep =>
        e.filter(pmod(col("event_id"), lit(3)) === ep)
          .coalesce(1).write.mode("append").parquet(in)
      }
      val stream = s.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
      val enriched = StreamOps.enrich(stream, cust, "c_custkey")
      val name = "graft_e3_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = enriched.writeStream.outputMode("append").format("memory")
        .queryName(name).option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(name)
        .select(col("event_id"), col("c_custkey"), col("c_mktsegment"),
          round(col("c_acctbal"), 4).as("acctbal"))
        .orderBy("event_id")
    }),

    // E4 — streaming exact dedup via dropDuplicatesWithinWatermark:
    // duplicates planted WITHIN batch 0 and ACROSS batches 0→1 and
    // 1→2; a years-long watermark keeps all key state live, so every
    // duplicate is suppressed and the output is exactly the distinct
    // input (duplicate rows are byte-identical, so which copy survives
    // is immaterial).

    "e4_stream_dedup" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .filter(col("event_id").isNotNull && col("ts").isNotNull)
        .select(col("event_id"), col("ts"), col("event_type"))
      val in = tmp("graft_e4in"); val ck = tmp("graft_e4ck")
      val m3 = pmod(col("event_id"), lit(3)); val m2 = pmod(col("event_id"), lit(2))
      Seq(
        e.filter(m3 === 0).unionAll(
          e.filter(m3 === 0 && pmod(col("event_id"), lit(5)) === 0)),
        e.filter(m3 === 1).unionAll(e.filter(m3 === 0 && m2 === 0)),
        e.filter(m3 === 2).unionAll(e.filter(m3 === 1 && m2 === 0))
      ).foreach(_.coalesce(1).write.mode("append").parquet(in))
      val stream = s.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
      val deduped = StreamOps.streamDedup(stream, "ts", "3650 days", "event_id")
      val name = "graft_e4_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = deduped.writeStream.outputMode("append").format("memory")
        .queryName(name).option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(name).select(col("event_id"), col("event_type"))
        .orderBy("event_id")
    }),

    // E5 — watermarked stream–stream interval join: purchases matched
    // to same-user views at most 1 hour earlier. Both sources split by
    // the SAME event-time terciles (mtime-pinned), so buffered state
    // that could still match is never behind the min-policy watermark —
    // the expiry proof lives in this query's scaladoc trail: a view
    // expires only when wm > vts + 1h, and every unseen purchase has
    // pts > wm, which would fail vts >= pts − 1h anyway.

    "e5_interval_join" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .filter(col("user_id").isNotNull && col("ts").isNotNull &&
          col("event_id").isNotNull)
      val (c1, c2) = terciles(e)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          col("ts").as("pts"))
      val v = e.filter(col("event_type") === "view")
        .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
          col("ts").as("vts"))
      val inP = tmp("graft_e5p"); val inV = tmp("graft_e5v")
      val ck = tmp("graft_e5ck")
      def dump(df: DataFrame, dirPath: String, tsCol: String): Unit = {
        val u = Relational.epochMicros(col(tsCol))
        Seq(df.filter(u <= c1), df.filter(u > c1 && u <= c2), df.filter(u > c2))
          .foreach(part => pinOrdered(part, dirPath))
      }
      dump(p, inP, "pts"); dump(v, inV, "vts")
      val sp = s.readStream.schema(p.schema)
        .option("maxFilesPerTrigger", 1).parquet(inP)
      val sv = s.readStream.schema(v.schema)
        .option("maxFilesPerTrigger", 1).parquet(inV)
      val joined = StreamOps.intervalJoin(sp, sv, leftKey = "p_user",
        rightKey = "v_user", leftTs = "pts", rightTs = "vts",
        watermark = "0 seconds", maxGap = "1 hour")
      val name = "graft_e5_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = joined.writeStream.outputMode("append").format("memory")
        .queryName(name).option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(name).select(col("p_id"), col("v_id")).orderBy("p_id", "v_id")
    }),

    // E20 — streaming rolling z-score alerts through the REAL
    // flatMapGroupsWithState machinery: tercile batches make arrival
    // order = (event-time, value) order, so the per-user 3-deep recent
    // window is replayable; alerts emit on arrival (no flush needed);
    // a decade TTL keeps lookback state from resetting mid-history.

    "e20_zscore_alerts" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.events(s, dir)
        .filter(col("user_id").isNotNull && col("ts").isNotNull &&
          col("value").isNotNull)
        .select(col("user_id"), date_trunc("second", col("ts")).as("ts"),
          col("value"))
      val us = Relational.epochMicros(col("ts"))
      val (c1, c2) = terciles(e)
      val in = tmp("graft_e20in"); val ck = tmp("graft_e20ck")
      Seq(e.filter(us <= c1), e.filter(us > c1 && us <= c2), e.filter(us > c2))
        .foreach(df => pinOrdered(df, in))
      val stream = s.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
        .as[StreamOps.ScoreEvent]
      val alerts = StreamOps.zScoreAlerts(s, stream, watermark = "0 seconds",
        lookback = 3, zThreshold = 2.0, stateTtlSeconds = 315360000L)
      val name = "graft_e20_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = alerts.toDF().writeStream.outputMode("append").format("memory")
        .queryName(name).option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(name)
        .select(col("user_id"), col("ts"), round(col("value"), 4).as("value"),
          round(col("z"), 4).as("z"))
        .orderBy("user_id", "ts", "value")
    }),

    // E23 — streaming Bloom-indexed ingest, probed end-to-end: three
    // epoch-keyed landings build the live sidecar, then a fixed bounded
    // probe set (≤10 keys, present AND absent) is answered ONLY through
    // candidate-file pruning — a green row proves the sidecar never
    // loses a key and absent keys return nothing.

    "e23_bloom_lookup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val dataRoot = tmp("graft_e23d"); val idxRoot = tmp("graft_e23i")
      (0 to 2).foreach { ep =>
        StreamOps.bloomIndexedBatch(docs.filter(col("doc_id") % 3 === ep),
          ep, "doc_id", dataRoot, idxRoot,
          expectedPerFile = 100000L, fpp = 0.01)
      }
      val index = s.read.parquet(idxRoot)
      val probes = 0L until 970L by 97L // fixed 10-key probe set
      probes.map { k =>
        graft.sources.BloomIndex.prunedRead(s, dataRoot, "doc_id",
          k.toString, index).select(col("doc_id"))
      }.reduce(_ unionAll _)
        .groupBy("doc_id").agg(count(lit(1)).as("n_rows"))
        .orderBy("doc_id")
    }),

    // E29 — streaming write-audit-publish ingest: epoch 1 carries
    // planted NULL texts, so its whole batch fails the NotNull check
    // and lands in quarantine; epochs 0/2 publish. The oracle is the
    // closed-form routing.

    "e29_audited_ingest" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"),
        when(col("doc_id") % 3 === 1 && col("doc_id") % 5 === 0,
          lit(null).cast("string")).otherwise(col("text")).as("text"))
      val dataRoot = tmp("graft_e29d"); val qRoot = tmp("graft_e29q")
      val checks = Seq(graft.etl.Checks.NotNull("text"))
      (0 to 2).foreach { ep =>
        StreamOps.auditedIngestBatch(docs.filter(col("doc_id") % 3 === ep),
          ep, checks, dataRoot, qRoot)
      }
      val landed = s.read.parquet(dataRoot)
        .select(col("doc_id"), col("batch").cast("long").as("epoch"),
          lit(false).as("quarantined"), col("text").isNull.as("text_null"))
      val quar = s.read.parquet(qRoot)
        .select(col("doc_id"), col("batch").cast("long").as("epoch"),
          lit(true).as("quarantined"), col("text").isNull.as("text_null"))
      landed.unionByName(quar).orderBy("doc_id")
    }),

    // E34 — late-data router: epoch 1 carries stragglers held back
    // from tercile 0; routing uses the PERSISTED per-epoch high-water
    // markers, so the oracle replays the marker fold in closed form.

    "e34_late_router" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .filter(col("ts").isNotNull && col("event_id").isNotNull)
        .select(col("event_id"), col("ts"))
      val us = Relational.epochMicros(col("ts"))
      val (c1, c2) = terciles(e)
      val straggler = col("event_id") % 10 === 0
      val onRoot = tmp("graft_e34o"); val lateRoot = tmp("graft_e34l")
      val delayUs = 600000000L // 10 minutes
      StreamOps.lateRoutedBatch(e.filter(us <= c1 && !straggler),
        0L, "ts", delayUs, onRoot, lateRoot)
      StreamOps.lateRoutedBatch(
        e.filter((us > c1 && us <= c2) || (us <= c1 && straggler)),
        1L, "ts", delayUs, onRoot, lateRoot)
      StreamOps.lateRoutedBatch(e.filter(us > c2),
        2L, "ts", delayUs, onRoot, lateRoot)
      val onTime = s.read.parquet(onRoot) // _watermark dir is discovery-hidden
        .select(col("event_id"), col("batch").cast("long").as("epoch"),
          lit(false).as("late"))
      val late = s.read.parquet(lateRoot)
        .select(col("event_id"), col("batch").cast("long").as("epoch"),
          lit(true).as("late"))
      onTime.unionByName(late).orderBy("event_id")
    }),

    // E35 — native session_window aggregation through the real
    // machinery: tercile batches + sentinel flushes (append mode emits
    // a session only once the watermark passes its end). The engine's
    // merge rule starts a NEW session at gap ≥ 30 min (window end is
    // exclusive), one boundary tighter than C10's strict->.

    "e35_session_window" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.events(s, dir)
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), col("ts"),
          coalesce(col("value"), lit(0.0)).as("value"))
      val us = Relational.epochMicros(col("ts"))
      val (c1, c2) = terciles(e)
      val in = tmp("graft_e35in"); val ck = tmp("graft_e35ck")
      val files = Seq(
        e.filter(us <= c1), e.filter(us > c1 && us <= c2), e.filter(us > c2),
        Seq((-1L, java.sql.Timestamp.valueOf("2150-01-01 00:00:00"), 0.0))
          .toDF("user_id", "ts", "value"),
        Seq((-2L, java.sql.Timestamp.valueOf("2200-01-01 00:00:00"), 0.0))
          .toDF("user_id", "ts", "value"))
      files.foreach(df => pinOrdered(df, in))
      val stream = s.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
      val sess = StreamOps.sessionWindowAgg(stream, ts = "ts",
        watermark = "0 seconds", gap = "30 minutes", groupCol = "user_id",
        valueCol = "value")
      val name = "graft_e35_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = sess.writeStream.outputMode("append").format("memory")
        .queryName(name).option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(name).filter(col("user_id") >= 0)
        .select(col("user_id"), col("session_start"), col("n_events"),
          round(col("sum_value"), 4).as("sum_value"))
        .orderBy("user_id", "session_start")
    }),

    // E6 — streaming Bronze ingest through the REAL toBronze sink:
    // three event-id-keyed micro-batches land append-only,
    // Hive-partitioned by the event-time-derived ingestion_date; the
    // per-day rollup of the landed Bronze must equal the batch
    // group-by over the full history — the append-only layout makes
    // the micro-batch split invisible to readers. toBronze starts with
    // the default trigger, so the drive is processAllAvailable + stop
    // rather than AvailableNow.

    "e6_bronze_ingest" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .filter(col("event_id").isNotNull && col("ts").isNotNull)
        .select(col("event_id"), col("user_id"), col("ts"),
          coalesce(col("value"), lit(0.0)).as("value"))
      val in = tmp("graft_e6in"); val ck = tmp("graft_e6ck")
      val out = tmp("graft_e6out")
      (0 to 2).foreach { ep =>
        e.filter(pmod(col("event_id"), lit(3)) === ep)
          .coalesce(1).write.mode("append").parquet(in)
      }
      val stream = s.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
      val q = StreamOps.toBronze(stream, "ts", out, ck)
      q.processAllAvailable(); q.stop()
      s.read.parquet(out)
        .groupBy(col(graft.etl.Medallion.PartitionCol).cast("string")
          .as("ingestion_date"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          round(sum(col("value")), 4).as("sum_value"))
        .orderBy("ingestion_date")
    }),

    // E7 — streaming content-hash-deduped Bronze ingest through the
    // REAL toBronzeDeduped sink: ascending-doc_id micro-batches
    // (mtime-pinned), within-batch keep-min-id + the persisted hash
    // index across batches, so the streaming first-arrival winner IS
    // the batch operator's global min-doc_id (d1's keep rule). The
    // landed Bronze must equal the one-shot exact dedup of the corpus.

    "e7_dedup_ingest" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"),
          timestamp_seconds(lit(1709251200L) +
            pmod(col("doc_id"), lit(5)) * 86400L).as("ts"))
      val in = tmp("graft_e7in"); val ck = tmp("graft_e7ck")
      val out = tmp("graft_e7out"); val idx = tmp("graft_e7ix")
      pinIdTerciles(docs, "doc_id", in)
      val stream = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
      val q = StreamOps.toBronzeDeduped(stream, "doc_id", "text", "ts",
        out, idx, ck)
      q.processAllAvailable(); q.stop()
      s.read.parquet(out)
        .select(col("doc_id"),
          col(graft.etl.Medallion.PartitionCol).cast("string")
            .as("ingestion_date"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
    }),

    // E10 — streaming SemDeDup ingest through the REAL
    // toSemanticDeduped sink: the quantizer is FROZEN on the full
    // corpus (the bootstrap contract), ascending-vec_id micro-batches
    // are judged against the persisted survivor index, and the oracle
    // replays the exact 3-stage survivor chain — epoch-0 pairwise
    // within the batch, later epochs vs prior SURVIVORS plus batch
    // mates — so the cross-epoch vs within-epoch asymmetry of the
    // incremental semantics is itself hash-checked.

    "e10_semantic_dedup" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      // truncate = materialize the FROZEN quantizer once: it is a lazy
      // plan, and every micro-batch (and the index build) would
      // otherwise re-run the full-corpus centroid sample
      val cents = graft.operators.Lineage.truncate(
        graft.similarity.Ann.ivfCentroids(emb, "vec_id", "embedding", 8))
      val in = tmp("graft_e10in"); val ck = tmp("graft_e10ck")
      val out = tmp("graft_e10out"); val idx = tmp("graft_e10ix")
      pinIdTerciles(emb, "vec_id", in)
      val stream = s.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
      val q = StreamOps.toSemanticDeduped(stream, "vec_id", "embedding",
        cents, 0.45, out, idx, ck)
      q.processAllAvailable(); q.stop()
      s.read.parquet(out)
        .select(col("vec_id"), col("batch").cast("long").as("epoch"))
        .orderBy("vec_id")
    }),

    // E10b — the SAME streaming SemDeDup ingest through the two-level
    // (D23b) quantizer: the scale path a sized deployment runs. One
    // frozen HierCentroids (trainRounds = 0, the d38b determinism rule)
    // drives every micro-batch through the shared epoch-keyed sink
    // body; the oracle is e10's 3-stage survivor chain over the d38b
    // hierarchical assignment instead of the flat one. nLists is SIZED
    // TO THE CORPUS like d38b (floor 9 keeps the sf0.01 oracle's 3×3
    // construction bit-identical): a fixed quantizer's within-cluster
    // batch-vs-index compare is ~n²/nLists — SCALEPROBE5 measured a
    // real 110× straggler stage at sf10 (one cluster = one unsplittable
    // compare) before this sizing.

    "e10b_semantic_dedup_hier" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val nLists = math.max(9, (emb.count() / 64).toInt)
      // hierCentroids eagerly truncates both quantizer tables = the
      // FROZEN quantizer contract across micro-batches
      val hier = graft.similarity.Ann.hierCentroids(emb, "vec_id", "embedding",
        nLists = nLists, trainRounds = 0)
      val in = tmp("graft_e10bin"); val ck = tmp("graft_e10bck")
      val out = tmp("graft_e10bout"); val idx = tmp("graft_e10bix")
      pinIdTerciles(emb, "vec_id", in)
      val stream = s.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
      val q = StreamOps.toSemanticDeduped(stream, "vec_id", "embedding",
        hier, 0.45, out, idx, ck)
      q.processAllAvailable(); q.stop()
      s.read.parquet(out)
        .select(col("vec_id"), col("batch").cast("long").as("epoch"))
        .orderBy("vec_id")
    }),

    // E13 — streaming CLEANED ingest through the REAL toCleanIngest
    // sink: per batch boilerplate-line strip → Gopher quality +
    // repetition gates over the CLEANED text → cross-batch exact dedup
    // on the cleaned content (NO within-batch dedup — same-batch
    // duplicates all land; the oracle mirrors exactly that: kept iff
    // gated and epoch = min epoch of the cleaned fingerprint).

    "e13_clean_ingest" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("text"))
      val in = tmp("graft_e13in"); val ck = tmp("graft_e13ck")
      val out = tmp("graft_e13out"); val idx = tmp("graft_e13ix")
      pinIdTerciles(docs, "doc_id", in)
      val stream = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
      val q = StreamOps.toCleanIngest(stream, "doc_id", "text", out, idx, ck)
      q.processAllAvailable(); q.stop()
      s.read.parquet(out)
        .select(col("doc_id"), col("batch").cast("long").as("epoch"),
          md5(col("text")).as("clean_md5"))
        .orderBy("doc_id")
    }),

    // E21 — streaming silence (heartbeat-loss) alerts through the REAL
    // flatMapGroupsWithState + EventTimeTimeout machinery: event-time
    // tercile batches, two far-future sentinels advance the watermark
    // so every surviving state alerts (the e2 flush discipline). The
    // alert CONTENT is split-deterministic: an episode alerts with its
    // merged last_seen whatever batch the timer fires in; the one
    // split-dependent case — present in batches 1 and 3 only, with the
    // batch-1 deadline already behind batch 1's max event time — emits
    // TWO episode alerts, and the oracle enumerates exactly that case.

    "e21_silence_alerts" -> ((s, dir) => {
      import s.implicits._
      val e0 = Tables.events(s, dir)
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), date_trunc("second", col("ts")).as("ts"),
          lit(0.0).as("value"))
      val us = Relational.epochMicros(col("ts"))
      val mm = e0.agg(min(us).as("lo"), max(us).as("hi")).head() // 1-row bounded
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val (c1, c2) = (lo + (hi - lo) / 3, lo + 2 * ((hi - lo) / 3))
      val gapSec = (hi - lo) / 6 / 1000000L // a sixth of the span
      // The oracle enumerates the double-alert branch ONLY for the
      // planted canary (batch-1 deadline vs batch 1's max event time);
      // for real users it assumes every one is active in every tercile
      // (so no ls2-NULL silence-then-reappear pattern exists whose
      // deadline lands between the batch-1 and batch-2 watermarks).
      // That is a GENERATOR property, not an operator property — assert
      // it here so dataset drift fails with this message instead of a
      // bare hash mismatch downstream.
      val inactive = e0
        .groupBy("user_id")
        .agg(max(when(us <= c1, 1).otherwise(0)).as("t1"),
          max(when(us > c1 && us <= c2, 1).otherwise(0)).as("t2"),
          max(when(us > c2, 1).otherwise(0)).as("t3"))
        .filter(col("t1") === 0 || col("t2") === 0 || col("t3") === 0)
        .count()
      require(inactive == 0,
        s"e21 oracle precondition violated: $inactive user(s) are not " +
          "active in every event-time tercile; the oracle's single-alert " +
          "enumeration no longer covers this dataset (see the canary note)")
      // canary for the one split-dependent branch: a planted user seen
      // at the span's first and last second and NOWHERE between — its
      // batch-1 deadline (lo + span/6) predates batch 1's max event
      // time (~lo + span/3), so its timer fires BEFORE it reappears in
      // batch 3 and it must alert TWICE (episode semantics). Real data
      // never exercises this (every user is active in every tercile);
      // the oracle plants the same two rows.
      val e = e0.unionAll(Seq(
        (999999991L, new java.sql.Timestamp(lo / 1000L), 0.0),
        (999999991L, new java.sql.Timestamp(hi / 1000L), 0.0))
        .toDF("user_id", "ts", "value"))
      val in = tmp("graft_e21in"); val ck = tmp("graft_e21ck")
      val files = Seq(
        e.filter(us <= c1), e.filter(us > c1 && us <= c2), e.filter(us > c2),
        Seq((-1L, java.sql.Timestamp.valueOf("2150-01-01 00:00:00"), 0.0))
          .toDF("user_id", "ts", "value"),
        Seq((-2L, java.sql.Timestamp.valueOf("2200-01-01 00:00:00"), 0.0))
          .toDF("user_id", "ts", "value"))
      files.foreach(df => pinOrdered(df, in))
      val stream = s.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
        .as[StreamOps.ScoreEvent]
      val alerts = StreamOps.silenceAlerts(s, stream,
        watermark = "0 seconds", gapSeconds = gapSec)
      val name = "graft_e21_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = alerts.toDF().writeStream.outputMode("append").format("memory")
        .queryName(name).option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(name).filter(col("user_id") >= 0)
        .select(col("user_id"),
          unix_timestamp(col("last_seen")).as("last_seen_sec"), col("gap_sec"))
        .orderBy("user_id", "last_seen_sec")
    })
  )

  private[graft] val oracleSql: Map[String, String] = Map(

    "e30_ohlc_bars" ->
      """WITH e AS (SELECT event_type, value, event_id,
        |    date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events WHERE ts IS NOT NULL),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY event_type, d ORDER BY us, event_id) AS ra,
        |    row_number() OVER (PARTITION BY event_type, d ORDER BY us DESC, event_id DESC) AS rz
        |  FROM e)
        |SELECT event_type, d AS bucket_start,
        | round(max(CASE WHEN ra = 1 THEN value END), 4) AS open,
        | round(max(value), 4) AS high, round(min(value), 4) AS low,
        | round(max(CASE WHEN rz = 1 THEN value END), 4) AS close,
        | count(*) AS volume
        |FROM r GROUP BY 1, 2 ORDER BY event_type, bucket_start""".stripMargin,

    // Per-user non-overlapping leftmost regex count over the FULL
    // ordered history (second-truncated timestamps, symbol tie-break —
    // the operator's millisecond graduation order); users with zero
    // matches emit nothing in append mode.

    "e27_seq_match" ->
      """WITH e AS (SELECT user_id,
        |   date_trunc('second', CAST(ts AS TIMESTAMP)) AS t,
        |   CASE event_type WHEN 'signup' THEN 's' WHEN 'view' THEN 'v'
        |        WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p'
        |        WHEN 'error' THEN 'e' ELSE '_' END AS sym
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL),
        |g AS (SELECT user_id, string_agg(sym, '' ORDER BY t, sym) AS seq FROM e GROUP BY 1),
        |m AS (SELECT user_id, len(regexp_extract_all(seq, 's[vc]*p')) AS nm FROM g)
        |SELECT user_id, CAST(nm AS BIGINT) AS total_matches
        |FROM m WHERE nm > 0 ORDER BY user_id""".stripMargin,

    // The batch C21 funnel over the full history.

    "e1_windowed_agg" ->
      """SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS bucket_start,
        | event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events
        |WHERE ts IS NOT NULL AND event_type IS NOT NULL AND event_id IS NOT NULL
        |GROUP BY 1, 2 ORDER BY bucket_start, event_type""".stripMargin,

    // The C10 gap rule (new session strictly past 1800 s) over
    // second-truncated history, rolled to per-session stats.

    "e2_sessionize" ->
      """WITH e AS (SELECT user_id,
        |   epoch_us(date_trunc('second', CAST(ts AS TIMESTAMP))) AS us,
        |   coalesce(value, 0) AS v
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |f AS (SELECT user_id, us, v,
        |  CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |    THEN 1 ELSE 0 END AS is_new
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, v)),
        |g AS (SELECT user_id, us, v,
        |  sum(is_new) OVER (PARTITION BY user_id ORDER BY us, v
        |    ROWS UNBOUNDED PRECEDING) AS sid
        | FROM f)
        |SELECT user_id, count(*) AS n_events,
        | CAST((max(us) - min(us)) // 1000000 AS BIGINT) AS duration_sec,
        | round(sum(v), 4) AS sum_value
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, n_events, duration_sec, sum_value""".stripMargin,

    // The plain dimension left join under the synthesized FK.

    "e3_enrich_join" ->
      """WITH n AS (SELECT count(*) AS nc FROM customer),
        |e AS (SELECT event_id, user_id % (SELECT nc FROM n) AS ck FROM events
        |  WHERE event_id IS NOT NULL AND user_id IS NOT NULL)
        |SELECT e.event_id, e.ck AS c_custkey, c.c_mktsegment,
        | round(c.c_acctbal, 4) AS acctbal
        |FROM e LEFT JOIN customer c ON c.c_custkey = e.ck
        |ORDER BY event_id""".stripMargin,

    // Every planted duplicate suppressed → exactly the distinct input.

    "e4_stream_dedup" ->
      """SELECT event_id, event_type FROM events
        |WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |ORDER BY event_id""".stripMargin,

    // All (purchase, view) pairs per user within the 1-hour lookback.

    "e5_interval_join" ->
      """WITH b AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS t, event_type
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL)
        |SELECT p.event_id AS p_id, v.event_id AS v_id
        |FROM b p JOIN b v ON v.user_id = p.user_id
        | AND p.event_type = 'purchase' AND v.event_type = 'view'
        | AND v.t <= p.t AND v.t >= p.t - INTERVAL 1 HOUR
        |ORDER BY p_id, v_id""".stripMargin,

    // The 3-deep rolling z-score replayed per user over (ts, value)
    // order: alert iff exactly 3 priors, positive spread, |z| > 2.

    "e20_zscore_alerts" ->
      """WITH e AS (SELECT user_id,
        |   date_trunc('second', CAST(ts AS TIMESTAMP)) AS t, value
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
        |w AS (SELECT user_id, t, value,
        |   count(*) OVER win AS cnt, avg(value) OVER win AS mu,
        |   stddev_samp(value) OVER win AS sd
        |  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY t, value
        |    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING))
        |SELECT user_id, t AS ts, round(value, 4) AS value,
        | round((value - mu) / sd, 4) AS z
        |FROM w WHERE cnt = 3 AND sd > 0 AND abs((value - mu) / sd) > 2.0
        |ORDER BY user_id, ts, value""".stripMargin,

    // Present probe keys return their one row through the sidecar;
    // absent keys return nothing.

    "e23_bloom_lookup" ->
      """SELECT doc_id, CAST(1 AS BIGINT) AS n_rows FROM documents
        |WHERE doc_id % 97 = 0 AND doc_id < 970
        |ORDER BY doc_id""".stripMargin,

    // Closed-form routing: epoch 1 fails NotNull(text) wholesale.

    "e29_audited_ingest" ->
      """SELECT doc_id, CAST(doc_id % 3 AS BIGINT) AS epoch,
        | (doc_id % 3 = 1) AS quarantined,
        | (doc_id % 3 = 1 AND doc_id % 5 = 0) AS text_null
        |FROM documents ORDER BY doc_id""".stripMargin,

    // The marker fold in closed form: epoch 1's watermark is epoch 0's
    // max event time − 10 min; epoch 2's is the max over both markers.

    "e34_late_router" ->
      """WITH e AS (SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
        |  WHERE ts IS NOT NULL AND event_id IS NOT NULL),
        |b AS (SELECT min(us) AS lo, max(us) AS hi FROM e),
        |c AS (SELECT lo + (hi - lo) // 3 AS c1, lo + 2 * ((hi - lo) // 3) AS c2 FROM b),
        |a AS (SELECT event_id, us,
        |   CASE WHEN us <= c.c1 AND event_id % 10 <> 0 THEN 0
        |        WHEN us <= c.c2 THEN 1 ELSE 2 END AS ep
        |  FROM e, c),
        |m AS (SELECT max(CASE WHEN ep = 0 THEN us END) AS m0,
        |             max(CASE WHEN ep <= 1 THEN us END) AS m01 FROM a)
        |SELECT event_id, CAST(ep AS BIGINT) AS epoch,
        | CASE WHEN ep = 0 THEN false
        |      WHEN ep = 1 THEN us < m.m0 - 600000000
        |      ELSE us < greatest(m.m0, m.m01) - 600000000 END AS late
        |FROM a, m ORDER BY event_id""".stripMargin,

    // The engine's session merge (window end exclusive): a gap of
    // EXACTLY 30 min starts a new session — >= where C10 uses >.

    "e35_session_window" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t,
        |   epoch_us(CAST(ts AS TIMESTAMP)) AS us, coalesce(value, 0) AS v
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |f AS (SELECT user_id, t, us, v,
        |  CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w >= 1800000000
        |    THEN 1 ELSE 0 END AS is_new
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, v)),
        |g AS (SELECT user_id, t, v,
        |  sum(is_new) OVER (PARTITION BY user_id ORDER BY us, v
        |    ROWS UNBOUNDED PRECEDING) AS sid
        | FROM f)
        |SELECT user_id, min(t) AS session_start, count(*) AS n_events,
        | round(sum(v), 4) AS sum_value
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    // Append-only Hive layout makes the batch split invisible: the
    // daily rollup is the plain batch group-by.

    "e6_bronze_ingest" ->
      """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS ingestion_date,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        | round(sum(coalesce(value, 0.0)), 4) AS sum_value
        |FROM events WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |GROUP BY 1 ORDER BY ingestion_date""".stripMargin,

    // d1's keep rule verbatim (global min doc_id per normalized
    // content hash) + the synthetic doc_id%5 ingestion-date ladder.

    "e7_dedup_ingest" ->
      """WITH f AS (SELECT doc_id, text,
        |   md5(regexp_replace(lower(trim(text)),'\s+',' ','g')) AS fp FROM documents),
        |w AS (SELECT fp, min(doc_id) AS d0 FROM f GROUP BY 1)
        |SELECT f.doc_id,
        | strftime(DATE '2024-03-01' + to_days(CAST(f.doc_id % 5 AS INTEGER)), '%Y-%m-%d')
        |   AS ingestion_date,
        | md5(f.text) AS text_md5
        |FROM f JOIN w ON f.fp = w.fp AND f.doc_id = w.d0
        |ORDER BY f.doc_id""".stripMargin,

    // The exact 3-stage survivor chain of the incremental SemDeDup
    // semantics: d38's centroid sample + argmax assignment, epoch-0
    // pairwise-vs-lower-id within the batch, later epochs judged
    // against prior SURVIVORS (not all prior vectors) plus lower-id
    // batch mates — the asymmetry that distinguishes E10 from D38.

    "e10_semantic_dedup" -> semanticSurvivorChainSql(
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
        |  FROM c cc, cents k) WHERE rn = 1)""".stripMargin),

    // e10's 3-stage survivor chain over the HIERARCHICAL assignment
    // (DedupQueries.hierAssignCtes = the d38b two-level mirror): the
    // cross-epoch/within-epoch survivor asymmetry is identical, only
    // the sharding differs.

    "e10b_semantic_dedup_hier" ->
      semanticSurvivorChainSql(DedupQueries.hierAssignCtes),

    // The composed cleaned-ingest truth: d47's boilerplate line rule
    // produces the cleaned text, the d41 + d42 gate fragments run OVER
    // that cleaned text, and a doc lands iff gated and its epoch is
    // the minimum epoch of its cleaned-content fingerprint (no
    // within-batch dedup — same-epoch duplicates all land).

    "e13_clean_ingest" ->
      s"""WITH cleaned AS (SELECT doc_id, source,
         |   coalesce(array_to_string(list_filter(
         |     list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)), x -> length(x) > 0),
         |     ${TextQueries.boilerplateKeepLambda}), chr(10)), '') AS text
         |  FROM documents),
         |${TextQueries.gopherQualityCtes("cleaned")},
         |${TextQueries.gopherRepetitionCtes("cleaned")},
         |gated AS (SELECT cl.doc_id, cl.text,
         |   CASE WHEN cl.doc_id <= (SELECT max(doc_id)//3 FROM documents) THEN 0
         |        WHEN cl.doc_id <= (SELECT (2*max(doc_id))//3 FROM documents) THEN 1 ELSE 2 END AS ep,
         |   md5(regexp_replace(lower(trim(cl.text)),'\\s+',' ','g')) AS fp
         |  FROM cleaned cl
         |  JOIN qf ON qf.doc_id = cl.doc_id
         |  JOIN fl ON fl.doc_id = cl.doc_id
         |  WHERE qf.ok_words AND qf.ok_mean AND qf.ok_sym AND qf.ok_alpha
         |    AND qf.ok_stop AND qf.ok_bullet AND qf.ok_ellipsis
         |    AND fl.ok_dl AND fl.ok_dlc AND fl.ok_dp AND fl.ok_dpc AND fl.ok_top AND fl.ok_dup),
         |win AS (SELECT fp, min(ep) AS e0 FROM gated GROUP BY 1)
         |SELECT g.doc_id, CAST(g.ep AS BIGINT) AS epoch, md5(g.text) AS clean_md5
         |FROM gated g JOIN win ON g.fp = win.fp AND g.ep = win.e0
         |ORDER BY g.doc_id""".stripMargin,

    // The episode enumeration: every user alerts once with the merged
    // last_seen of its presence run — except the batch-1-and-3-only
    // pattern whose batch-1 deadline predates batch 1's max event time
    // (the timer fires in batch 2, BEFORE the reappearance), which
    // emits two episode alerts. Sentinels guarantee every surviving
    // state eventually fires; all arithmetic is integer seconds, the
    // exact granularity the truncated input gives the state machine.

    "e21_silence_alerts" ->
      """WITH e0 AS (SELECT user_id,
        |   epoch_us(date_trunc('second', ts))//1000000 AS tsec
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |e AS (SELECT * FROM e0
        |  UNION ALL SELECT 999999991, min(tsec) FROM e0
        |  UNION ALL SELECT 999999991, max(tsec) FROM e0),
        |b AS (SELECT min(tsec)*1000000 AS lo, max(tsec)*1000000 AS hi FROM e),
        |k AS (SELECT lo + (hi-lo)//3 AS c1, lo + 2*((hi-lo)//3) AS c2,
        |   ((hi-lo)//6)//1000000 AS gap FROM b),
        |m AS (SELECT e.user_id,
        |   max(CASE WHEN tsec*1000000 <= k.c1 THEN tsec END) AS ls1,
        |   max(CASE WHEN tsec*1000000 > k.c1 AND tsec*1000000 <= k.c2 THEN tsec END) AS ls2,
        |   max(CASE WHEN tsec*1000000 > k.c2 THEN tsec END) AS ls3
        |  FROM e, k GROUP BY 1),
        |w1 AS (SELECT max(CASE WHEN tsec*1000000 <= k.c1 THEN tsec END) AS wsec FROM e, k),
        |a AS (
        |  SELECT user_id, ls1 AS ls FROM m, w1, k
        |    WHERE ls1 IS NOT NULL AND ls2 IS NULL AND ls3 IS NOT NULL AND w1.wsec > ls1 + k.gap
        |  UNION ALL
        |  SELECT user_id, ls3 FROM m, w1, k
        |    WHERE ls1 IS NOT NULL AND ls2 IS NULL AND ls3 IS NOT NULL AND w1.wsec > ls1 + k.gap
        |  UNION ALL
        |  SELECT user_id, greatest(coalesce(ls1, 0), coalesce(ls2, 0), coalesce(ls3, 0)) AS ls
        |    FROM m, w1, k
        |    WHERE NOT (ls1 IS NOT NULL AND ls2 IS NULL AND ls3 IS NOT NULL AND w1.wsec > ls1 + k.gap))
        |SELECT a.user_id, CAST(a.ls AS BIGINT) AS last_seen_sec,
        | CAST(k.gap AS BIGINT) AS gap_sec
        |FROM a, k ORDER BY user_id, last_seen_sec""".stripMargin
  )
}
