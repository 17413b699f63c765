package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming operators: the streaming mirror of the batch
  * operators in [[graft.operators.Relational]]. Each works on any
  * streaming DataFrame (`readStream` source, kafka, MemoryStream in
  * tests) and carries a watermark so state is bounded at scale.
  */
object StreamOps extends StreamOpsStateful {

  /** Watermarked tumbling-window counts/sums per group — the canonical
    * streaming aggregation. State per (window, group) is dropped once
    * the watermark passes the window end, so state size is bounded by
    * (active windows × groups), independent of stream length. */
  def windowedAgg(
      events: DataFrame,
      ts: String,
      watermark: String,
      bucket: String,
      groupCol: String,
      valueCol: String): DataFrame =
    events.withWatermark(ts, watermark)
      .groupBy(window(col(ts), bucket), col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))
      .select(col("window.start").as("bucket_start"), col(groupCol), col("n"), col("sum_value"))

  /** E30 — streaming OHLC bars, the live
    * [[graft.operators.TimeSeries.ohlcBars]]: one finalized candlestick
    * per (key, bucket) once the watermark closes the window. The same
    * single-aggregate shape as [[windowedAgg]] — open/close are
    * `min_by`/`max_by` over the (event-time, tieBreak) struct, which
    * streaming hash aggregation maintains incrementally in (window ×
    * key)-bounded state; late-but-within-watermark events fold into
    * the right bar in their true event-time position, and the bar
    * emits exactly once in append mode when the watermark passes the
    * window end. */
  def streamingOhlcBars(
      events: DataFrame,
      ts: String,
      watermark: String,
      bucket: String,
      groupCol: String,
      valueCol: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val orderKey = struct((unix_micros(col(ts)) +: tieBreak.map(col)): _*)
    events.withWatermark(ts, watermark)
      .groupBy(window(col(ts), bucket), col(groupCol))
      .agg(
        min_by(col(valueCol), orderKey).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), orderKey).as("close"),
        count(lit(1)).as("volume"))
      .select(col("window.start").as("bucket_start"), col(groupCol),
        col("open"), col("high"), col("low"), col("close"), col("volume"))
  }

  final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  final case class SessionOut(user_id: Long, n_events: Long, duration_sec: Long, sum_value: Double)

  /** Stateful gap sessionization via `flatMapGroupsWithState`: a session
    * closes when no event arrives within `gapSeconds` (event-time
    * timeout). Emits one row per closed session. State is one small
    * record per active user — bounded by active users; the event-time
    * timeout + watermark guarantee state cleanup at scale.
    * Batch equivalent: [[graft.operators.Relational.sessionize]]. */
  def sessionize(
      spark: SparkSession,
      events: Dataset[SessionEvent],
      watermark: String,
      gapSeconds: Long): Dataset[SessionOut] = {
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.n, (s.last - s.start) / 1000, s.sum))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapSeconds * 1000 =>
                  // min/max, not assignment: a late-but-in-watermark event
                  // from a later micro-batch can precede the stored state
                  // (t < s.last, even t < s.start) and must widen the
                  // session, never rewind its end or truncate its start —
                  // rewinding `last` corrupted durations and split
                  // sessions whose true gap was within bounds. Such late
                  // events merge into the ACTIVE session by design; a
                  // session cannot be retroactively split once its events
                  // were folded into state.
                  cur = Some(s.copy(
                    start = math.min(s.start, t), last = math.max(s.last, t),
                    n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  closed ::= SessionOut(userId, s.n, (s.last - s.start) / 1000, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // Clamp: with EventTimeTimeout Spark rejects a timeout at or
              // before the current watermark, and a late-but-in-watermark
              // batch can leave s.last + gap behind it — such a session is
              // already expired, so time it out on the next watermark tick.
              val target = s.last + gapSeconds * 1000
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(math.max(target, wm + 1))
            }
            closed.reverseIterator
          }
      }
  }

  /** Stream–static enrichment join: each micro-batch joins against a
    * static dimension. Spark broadcasts the static side when small, so
    * the stream is never shuffled — the canonical dimension-enrichment
    * pattern. */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Streaming → Bronze ingest: write each micro-batch Hive-partitioned
    * by `ingestion_date` derived from event time — the streaming mouth
    * of the [[graft.etl.Medallion]] layer (downstream incremental
    * Silver/Gold runs pick partitions up via `.done` markers exactly as
    * with batch ingest).
    *
    * `foreachBatch` rather than a plain file sink so the partition
    * column is derived per batch and the write path stays the shared
    * [[graft.etl.Medallion.writePartitioned]]. Exactly-once comes from
    * the checkpoint + append-only layout; re-processed batches re-append,
    * so downstream Silver dedups on the record key (A7) as the
    * reference's pipeline does. Returns the started query. */
  def toBronze(
      events: DataFrame,
      ts: String,
      outRoot: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.etl.Medallion.writePartitioned(
          batch.withColumn(graft.etl.Medallion.PartitionCol,
            date_format(col(ts), "yyyy-MM-dd")),
          outRoot)
      }
      .start()

  /** Watermarked stream–stream inner join: match events from two
    * streams on a key within a bounded event-time interval (e.g. each
    * purchase to the views that preceded it by at most `maxGap`).
    *
    * Both sides carry watermarks and the join condition bounds the
    * right-side event time relative to the left's, so Spark can expire
    * buffered state once the watermark passes the interval — without
    * the time bound a stream-stream join must buffer both streams
    * forever. State is O(events per watermark window per side).
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      watermark: String,
      maxGap: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r, expr(
      s"$leftKey = $rightKey AND $rightTs <= $leftTs AND $rightTs >= $leftTs - INTERVAL $maxGap"))
  }

  /** Streaming ingest with CROSS-BATCH exact dedup against a persisted
    * content-hash index — the streaming form of the day-2 pattern
    * ([[graft.dedup.Dedup.exactDedupAgainst]]): never re-scan the
    * corpus to admit today's batch, and never let a retried fetch
    * re-admit yesterday's document. [[streamDedup]] bounds its state by
    * the watermark, so it cannot catch a duplicate arriving days later;
    * this sink can, because its state is the persisted hash index, not
    * executor memory.
    *
    * Per micro-batch: (1) within-batch exact dedup (keep-min-id);
    * (2) anti-join the batch's content hashes against the stored index
    * — only the BATCH is hashed, the index contributes its (bucketable)
    * 32-byte digests; (3) append survivors Hive-partitioned under
    * `outRoot`; (4) append survivors' hashes to the index. A batch
    * replayed after a crash between (3) and (4) re-appends its rows —
    * same at-least-once contract as [[toBronze]]; downstream Silver
    * key-dedup (A7) remains the exactly-once backstop. */
  def toBronzeDeduped(
      docs: DataFrame,
      id: String,
      text: String,
      ts: String,
      outRoot: String,
      indexPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        import graft.dedup.Dedup
        val spark = batch.sparkSession
        val inBatch = Dedup.exactDedup(batch, col(id), col(text))
        // existence via the Hadoop filesystem of the path's own scheme —
        // java.nio would answer false forever on hdfs:// or s3a:// and
        // silently disable the cross-batch dedup this sink exists for
        val hPath = new org.apache.hadoop.fs.Path(indexPath)
        val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
        val novel =
          if (fs.exists(hPath))
            Dedup.exactDedupAgainst(inBatch, col(text), spark.read.parquet(indexPath))
          else inBatch
        // one batch, two actions — cache survivors so the text column is
        // hashed once, not once per write
        novel.persist()
        try {
          graft.etl.Medallion.writePartitioned(
            novel.withColumn(graft.etl.Medallion.PartitionCol,
              date_format(col(ts), "yyyy-MM-dd")),
            outRoot)
          Dedup.contentHashIndex(novel, col(text))
            .write.mode("append").parquet(indexPath)
        } finally novel.unpersist()
      }
      .start()

  /** Streaming exact dedup: drop records whose key was already seen,
    * with state bounded by the watermark — the streaming mirror of
    * [[graft.dedup.Dedup.exactDedup]] for ingest-time duplicate
    * suppression (retried fetches, at-least-once sources).
    *
    * `dropDuplicatesWithinWatermark` keeps per-key state only until the
    * watermark passes, so state is O(keys per watermark window), not
    * O(stream length) — the property that makes exact dedup viable on an
    * unbounded 100 TB/day stream. Duplicates arriving later than the
    * watermark delay are NOT caught (that is the batch layer's job in a
    * lambda-style pipeline). */
  def streamDedup(events: DataFrame, ts: String, watermark: String, keys: String*): DataFrame =
    events.withWatermark(ts, watermark)
      .dropDuplicatesWithinWatermark(keys.toSeq)

  /** Streaming maintenance of a mergeable HLL sketch TABLE (the C8c
    * Gold state, fed incrementally): each micro-batch aggregates its
    * rows into per-(keys) sketches and APPENDS them to `statePath`.
    * Append-only is the point — no read-modify-write of the state per
    * batch: HLL unions are lossless and associative, so any number of
    * physical rows per bucket roll up to exactly the sketch a full
    * rescan would produce ([[graft.operators.Sketches.unionEstimate]]
    * unions at read; [[graft.operators.Sketches.compactTable]] collapses
    * rows periodically — the same append-then-compact lifecycle as the
    * Bronze layer itself).
    *
    * `keys` reference batch columns — include the time bucket (e.g. a
    * `date_format(ts)` column added upstream) so late data only ever
    * appends to its own bucket. A replayed batch appends duplicate
    * sketch rows, which inflate estimates of RE-SKETCHED rows only if
    * the same underlying rows also re-appended upstream — distinct
    * counting is idempotent under re-unioning the same values (the
    * at-least-once story here is strictly better than for additive
    * counters). */
  /** Streaming CDC apply: maintain a keyed SNAPSHOT table from a
    * change stream ([[graft.etl.Upsert]] per micro-batch). Each batch
    * merges into the latest snapshot version and writes a NEW
    * `v=N` directory — read-modify-write against the directory being
    * read is never safe on object stores, and versioned writes give
    * time travel + a trivially atomic "latest = max N" pointer for
    * free (the Delta/Iceberg snapshot idea reduced to plain parquet).
    * Old versions are retained; pruning them is ordinary directory
    * deletion once readers drain. A replayed batch merges the same
    * updates again — upsert is idempotent per (key, version), so the
    * extra snapshot version holds the same ROWS (file layout may
    * differ), not wrong data. */
  def toSnapshot(
      updates: DataFrame,
      keyCols: Seq[String],
      version: String,
      outRoot: String,
      checkpoint: String,
      tombstone: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        snapshotBatch(batch.toDF(), keyCols, version, outRoot, tombstone)
      }
      .start()

  /** One micro-batch of [[toSnapshot]], exposed for replay tests and
    * driver batch-equivalence queries. */
  private[graft] def snapshotBatch(
      batch: DataFrame,
      keyCols: Seq[String],
      version: String,
      outRoot: String,
      tombstone: Option[String]): Unit = {
    val spark = batch.sparkSession
    val latest = latestSnapshotVersion(spark, outRoot)
    val cur = latest
      .map(v => spark.read.parquet(s"$outRoot/v=$v"))
      .getOrElse(tombstone.fold(batch)(batch.drop(_)).limit(0))
    graft.etl.Upsert.upsert(cur, batch, keyCols, version, tombstone)
      .write.mode("overwrite").parquet(s"$outRoot/v=${latest.getOrElse(0L) + 1}")
  }

  private def latestSnapshotVersion(spark: SparkSession, outRoot: String): Option[Long] = {
    val root = new org.apache.hadoop.fs.Path(outRoot)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) None
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.drop(2).toLong)
      .maxOption
  }

  /** The current snapshot of a [[toSnapshot]] dir (`latest = max N` —
    * the trivially atomic pointer the versioned layout buys). */
  def latestSnapshot(spark: SparkSession, outRoot: String): DataFrame =
    latestSnapshotVersion(spark, outRoot) match {
      case Some(v) => spark.read.parquet(s"$outRoot/v=$v")
      case None => throw new IllegalStateException(s"no snapshot versions under $outRoot")
    }

  /** Streaming SemDeDup ingest: per micro-batch, judge arriving
    * embeddings against the persisted survivor index with
    * [[graft.similarity.Ann.semanticDedupAgainst]] (cluster-blocked
    * cosine, min-id keep), write ONLY the semantic survivors to
    * `outRoot`, and append their [[graft.similarity.Ann.semanticIndex]]
    * rows to `indexPath` — so duplicates are suppressed across batches
    * and restarts, far beyond any watermark horizon (the E7 pattern
    * with a vector index instead of a content-hash index).
    *
    * `centroids` is the FROZEN coarse quantizer (train once on a
    * bootstrap corpus via [[graft.similarity.Ann.ivfCentroids]] /
    * `refineCentroids`): every batch and the index must shard the
    * space identically or the cluster-blocked comparison loses its
    * guarantee. First batch bootstraps the index from a typed empty
    * frame. Index state lives on disk, not in executors — executor
    * loss costs nothing.
    *
    * Replay safety: both outputs land under `batch=<epochId>`
    * subdirectories in OVERWRITE mode, and the index read EXCLUDES the
    * current epoch's own rows — so an at-least-once replay (including
    * a crash BETWEEN the two writes, which under plain appends left
    * the index behind the output and double-admitted on retry)
    * re-judges against exactly the pre-batch index and rewrites both
    * directories to the same state. Idempotent per epoch as long as
    * the source replays the same batch content, which Structured
    * Streaming's checkpoint contract guarantees for replayable
    * sources. */
  def toSemanticDeduped(
      docs: DataFrame,
      id: String,
      vec: String,
      centroids: DataFrame,
      threshold: Double,
      outRoot: String,
      indexPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], epochId: Long) =>
        semanticDedupBatch(batch.toDF(), epochId, id, vec, centroids, threshold,
          outRoot, indexPath)
      }
      .start()

  /** [[toSemanticDeduped]] through the two-level quantizer (D23b):
    * identical sink semantics, but batch assignment and index rows go
    * through [[graft.similarity.Ann.ivfAssignHier]] — the 10^10-vector
    * indexing wall applies to a streaming semantic index exactly as it
    * does to batch SemDeDup. The hier quantizer is FROZEN like the
    * flat one: every batch and the index must shard identically. */
  def toSemanticDeduped(
      docs: DataFrame,
      id: String,
      vec: String,
      hier: graft.similarity.Ann.HierCentroids,
      threshold: Double,
      outRoot: String,
      indexPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], epochId: Long) =>
        semanticDedupBatch(batch.toDF(), epochId, id, vec, hier, threshold,
          outRoot, indexPath)
      }
      .start()

  /** One micro-batch of [[toSemanticDeduped]] (flat quantizer), exposed
    * for replay tests: running the same (batch, epochId) twice must
    * leave identical output and index state. */
  private[graft] def semanticDedupBatch(
      batch: DataFrame,
      epochId: Long,
      id: String,
      vec: String,
      centroids: DataFrame,
      threshold: Double,
      outRoot: String,
      indexPath: String): Unit = {
    import graft.similarity.Ann
    semanticDedupBatchImpl(batch, epochId, id, outRoot, indexPath,
      emptyIndex = () => Ann.semanticIndex(batch.limit(0), id, vec, centroids),
      judge = idx => Ann.semanticDedupAgainst(batch, id, vec, centroids, idx, threshold),
      indexOf = kept => Ann.semanticIndex(kept, id, vec, centroids))
  }

  /** One micro-batch of the hierarchical-quantizer sink. */
  private[graft] def semanticDedupBatch(
      batch: DataFrame,
      epochId: Long,
      id: String,
      vec: String,
      hier: graft.similarity.Ann.HierCentroids,
      threshold: Double,
      outRoot: String,
      indexPath: String): Unit = {
    import graft.similarity.Ann
    semanticDedupBatchImpl(batch, epochId, id, outRoot, indexPath,
      emptyIndex = () => Ann.semanticIndex(batch.limit(0), id, vec, hier),
      judge = idx => Ann.semanticDedupAgainst(batch, id, vec, hier, idx, threshold),
      indexOf = kept => Ann.semanticIndex(kept, id, vec, hier))
  }

  /** Shared epoch-keyed sink body: ONE implementation of the replay
    * contract (pre-batch index read excluding the replaying epoch,
    * overwrite-per-epoch dual write) so the flat and hierarchical
    * quantizer paths cannot diverge on idempotency. */
  private def semanticDedupBatchImpl(
      batch: DataFrame,
      epochId: Long,
      id: String,
      outRoot: String,
      indexPath: String,
      emptyIndex: () => DataFrame,
      judge: DataFrame => DataFrame,
      indexOf: DataFrame => DataFrame): Unit = {
    val index = priorIndex(batch.sparkSession, indexPath, epochId, emptyIndex)
    val keptIds = judge(index).filter(col("kept")).select(col("vid"))
    val kept = batch.join(keptIds, batch(id) === col("vid"), "left_semi")
    kept.persist()
    try {
      kept.write.mode("overwrite").parquet(s"$outRoot/batch=$epochId")
      indexOf(kept).write.mode("overwrite").parquet(s"$indexPath/batch=$epochId")
    } finally kept.unpersist()
  }

  /** Streaming CLEANED ingest — the composed E-side of the
    * [[graft.etl.PretrainPipeline]]: per micro-batch, strip boilerplate
    * lines ([[graft.text.Boilerplate]]), gate on the Gopher quality +
    * repetition rules over the CLEANED text, drop documents whose
    * cleaned content already exists in the persisted hash index
    * (cross-batch exact dedup, E7's state), land survivors under
    * `outRoot` and advance the index — so a crawl stream arrives
    * training-ready: chrome stripped, junk gated, duplicates
    * suppressed across batches and restarts.
    *
    * Same epoch-keyed replay contract as the other index sinks
    * (overwrite per `batch=<epochId>`, index read excludes the
    * replaying epoch). Output columns: the input columns with `text`
    * REPLACED by the cleaned text. */
  def toCleanIngest(
      docs: DataFrame,
      id: String,
      text: String,
      outRoot: String,
      indexPath: String,
      checkpoint: String,
      minWords: Int = 50): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], epochId: Long) =>
        cleanIngestBatch(batch.toDF(), epochId, id, text, outRoot, indexPath, minWords)
      }
      .start()

  /** One micro-batch of [[toCleanIngest]], exposed for replay tests. */
  private[graft] def cleanIngestBatch(
      batch: DataFrame,
      epochId: Long,
      id: String,
      text: String,
      outRoot: String,
      indexPath: String,
      minWords: Int): Unit = {
    import graft.dedup.Dedup
    import graft.text.{Boilerplate, GopherFilter, GopherRepetition}
    val cleaned = Boilerplate.addCleanLines(batch, col(text), "__bl")
      .withColumn(text, col("__bl.clean_text"))
      .drop("__bl")
    val gated = GopherRepetition.addFlags(
        cleaned.withColumn("__q", GopherFilter.flags(col(text), minWords)), col(text), "__r")
      .filter(col("__q.keep") && col("__r.keep"))
      .drop("__q", "__r")
    val index = priorIndex(batch.sparkSession, indexPath, epochId,
      () => Dedup.contentHashIndex(batch.limit(0), col(text)))
    val kept = Dedup.exactDedupAgainst(gated, col(text), index)
    kept.persist()
    try {
      kept.write.mode("overwrite").parquet(s"$outRoot/batch=$epochId")
      Dedup.contentHashIndex(kept, col(text))
        .write.mode("overwrite").parquet(s"$indexPath/batch=$epochId")
    } finally kept.unpersist()
  }

  /** The PRE-batch state of an epoch-keyed persisted index: drops any
    * half-written state of THIS epoch (crash + replay — the batch must
    * be judged against exactly the pre-batch index). An index written
    * by a pre-epoch-keyed layout (flat files, no `batch=` dirs) has no
    * `batch` column — all its rows are by definition prior state, so
    * it reads unfiltered; do NOT mix the two layouts in one directory
    * (parquet partition discovery rejects that), start a new index
    * path instead. A missing directory bootstraps via `emptyIndex` —
    * a TYPED zero-row frame, keeping the first batch on the exact code
    * path every other batch runs. */
  private def priorIndex(spark: SparkSession, indexPath: String, epochId: Long,
                         emptyIndex: () => DataFrame): DataFrame = {
    val hPath = new org.apache.hadoop.fs.Path(indexPath)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(hPath)) {
      val raw = spark.read.parquet(indexPath)
      if (raw.columns.contains("batch"))
        raw.filter(col("batch") =!= lit(epochId)).drop("batch")
      else raw
    } else emptyIndex()
  }

  /** Streaming PARAGRAPH-dedup ingest: per micro-batch, judge arriving
    * documents' paragraphs against the persisted fingerprint index with
    * [[graft.dedup.Dedup.paragraphDedupAgainst]], write the reassembled
    * documents (doc_id, n_paras, n_kept, clean_text) to `outRoot`, and
    * append the batch's surviving-paragraph fingerprints to
    * `indexPath` — the E7 content-hash pattern at paragraph
    * granularity: cross-batch boilerplate paragraphs are suppressed
    * forever, far beyond any watermark horizon, while novel paragraphs
    * of partially-duplicated documents still land.
    *
    * Replay safety: identical contract to [[toSemanticDeduped]] — both
    * outputs under `batch=<epochId>` in OVERWRITE mode, index read
    * excludes the replaying epoch's own rows. Index state lives on
    * disk; executor loss costs nothing. */
  def toParagraphDeduped(
      docs: DataFrame,
      id: String,
      text: String,
      outRoot: String,
      indexPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], epochId: Long) =>
        paragraphDedupBatch(batch.toDF(), epochId, id, text, outRoot, indexPath)
      }
      .start()

  /** One micro-batch of [[toParagraphDeduped]], exposed for replay
    * tests: running the same (batch, epochId) twice must leave
    * identical output and index state. */
  private[graft] def paragraphDedupBatch(
      batch: DataFrame,
      epochId: Long,
      id: String,
      text: String,
      outRoot: String,
      indexPath: String): Unit = {
    import graft.dedup.Dedup
    val index = priorIndex(batch.sparkSession, indexPath, epochId,
      () => Dedup.paragraphIndex(batch.limit(0), col(text)))
    val result = Dedup.paragraphDedupAgainst(batch, col(id), col(text), index)
    result.persist()
    try {
      result.write.mode("overwrite").parquet(s"$outRoot/batch=$epochId")
      // the kept paragraphs ARE clean_text's blocks: re-splitting
      // recovers them exactly (paragraph boundaries were consumed by
      // the original split, so the "\n\n" joins are unambiguous)
      Dedup.paragraphIndex(result.filter(col("n_kept") > 0), col("clean_text"))
        .write.mode("overwrite").parquet(s"$indexPath/batch=$epochId")
    } finally result.unpersist()
  }

  /** Streaming corpus profiling: each micro-batch APPENDS its mergeable
    * [[graft.text.CorpusProfile.sketchCards]] rows to `cardsPath` —
    * the E8 append-only discipline (no read-modify-write on object
    * stores) applied to the corpus card. The global card at any moment
    * is `CorpusProfile.rollupCards(spark.read.parquet(cardsPath))`:
    * sums merge exactly, distinct fingerprints and quality quantiles
    * merge sketch-side, and no raw document is ever re-read. Compact
    * periodically by rolling old rows up per slice if the row count
    * matters; rollups are union-lossless either way.
    *
    * Replay safety: card rows are ADDITIVE counters (unlike
    * [[toSketchState]]'s union-tolerant HLLs), so a plain append would
    * double-count on an at-least-once replay. Each batch's cards land
    * under a `batch=<epochId>` subdirectory in OVERWRITE mode instead
    * — a replayed epoch rewrites its own rows, never inflates the
    * rollup. */
  def toCorpusCards(
      docs: DataFrame,
      text: String,
      source: String,
      slice: String,
      cardsPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], epochId: Long) =>
        corpusCardsBatch(batch.toDF(), epochId, text, source, slice, cardsPath)
      }
      .start()

  /** One micro-batch of [[toCorpusCards]], exposed for replay tests:
    * running the same (batch, epochId) twice must not inflate the
    * rolled-up counters. */
  private[graft] def corpusCardsBatch(
      batch: DataFrame,
      epochId: Long,
      text: String,
      source: String,
      slice: String,
      cardsPath: String): Unit =
    graft.text.CorpusProfile
      .sketchCards(batch, col(text), col(source), col(slice))
      .write.mode("overwrite").parquet(s"$cardsPath/batch=$epochId")

  /** Streaming A/B experiment monitor ([[graft.analytics.Experiment]]'s
    * live form): each micro-batch lands its per-(entity, variant)
    * conversion partials (`conv` = any-converted max, `val` = converted
    * value sum) under `batch=<epochId>` in OVERWRITE mode, and the live
    * readout is [[experimentReadout]] — which re-collapses entities
    * ACROSS epochs before the variant algebra, so a user who converts
    * in epoch 7 after exposure in epoch 2 still counts once (the
    * entity-grain contract that makes a streaming experiment readout
    * honest). State per epoch is touched-entities-sized, never
    * event-volume-sized; conv/val partials are max/sum-mergeable, and
    * the epoch-keyed overwrite keeps at-least-once replay a no-op (the
    * E14 additive-counter contract). */
  def toExperimentState(
      events: DataFrame,
      entity: String,
      variant: org.apache.spark.sql.Column,
      converted: org.apache.spark.sql.Column,
      value: org.apache.spark.sql.Column,
      statePath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], epochId: Long) =>
        experimentStateBatch(batch.toDF(), epochId, entity, variant, converted, value, statePath)
      }
      .start()

  /** One micro-batch of [[toExperimentState]], exposed for replay tests. */
  private[graft] def experimentStateBatch(
      batch: DataFrame,
      epochId: Long,
      entity: String,
      variant: org.apache.spark.sql.Column,
      converted: org.apache.spark.sql.Column,
      value: org.apache.spark.sql.Column,
      statePath: String): Unit =
    batch
      .groupBy(col(entity).as("entity"), variant.as("variant"))
      .agg(max(converted.cast("int")).as("conv"),
        sum(when(converted, value).otherwise(lit(0.0))).as("val"))
      .write.mode("overwrite").parquet(s"$statePath/batch=$epochId")

  /** Live readout over [[toExperimentState]] state: merge the per-epoch
    * entity partials (max/sum), then run the standard two-variant
    * algebra. The merged state feeds [[graft.analytics.Experiment.abTest]]
    * directly — its entity-grain collapse is idempotent over partials. */
  def experimentReadout(spark: SparkSession, statePath: String): DataFrame = {
    val merged = spark.read.parquet(statePath)
      .groupBy("entity", "variant")
      .agg(max(col("conv")).as("conv"), sum(col("val")).as("val"))
    graft.analytics.Experiment.abTest(merged,
      col("entity"), col("variant"), col("conv") === 1, col("val"))
  }

  /** Streaming exactly-k weighted sampling
    * ([[graft.operators.Sampling.weightedSampleK]]'s live form): each
    * micro-batch lands its OWN top-k race winners under
    * `batch=<epochId>`, and [[weightedSampleReadout]] re-races the
    * union — correct because a global race winner necessarily wins its
    * own batch (top-k ⊆ union of per-batch top-ks), and replay-
    * idempotent BY DETERMINISM: race keys are md5-derived from (key,
    * salt), so a replayed epoch rewrites byte-identical candidates
    * (stronger than the E14 overwrite contract — even a blind append
    * would only add duplicates the readout's key-dedup removes). State
    * is epochs × k rows; the stream is never re-scanned. */
  def toWeightedSample(
      events: DataFrame,
      key: String,
      weight: org.apache.spark.sql.Column,
      k: Int,
      salt: String,
      statePath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], epochId: Long) =>
        weightedSampleBatch(batch.toDF(), epochId, key, weight, k, salt, statePath)
      }
      .start()

  /** One micro-batch of [[toWeightedSample]], exposed for replay tests. */
  private[graft] def weightedSampleBatch(
      batch: DataFrame,
      epochId: Long,
      key: String,
      weight: org.apache.spark.sql.Column,
      k: Int,
      salt: String,
      statePath: String): Unit =
    graft.operators.Sampling.weightedSampleK(batch, col(key), weight, k, salt)
      .write.mode("overwrite").parquet(s"$statePath/batch=$epochId")

  /** Live sample over [[toWeightedSample]] state: re-race the union of
    * per-epoch candidates (epochs × k rows — metadata-scale). `weight`
    * must name the same column the sink raced on, `k`/`salt` the same
    * parameters; keys seen in several epochs dedup to one runner. */
  def weightedSampleReadout(
      spark: SparkSession,
      statePath: String,
      key: String,
      weight: String,
      k: Int,
      salt: String): DataFrame =
    graft.operators.Sampling.weightedSampleK(
      spark.read.parquet(statePath).drop("batch").dropDuplicates(key),
      col(key), col(weight), k, salt)

  /** Streaming incremental-aggregate maintenance: each micro-batch's
    * [[graft.operators.AggState]] state lands under `batch=<epochId>`
    * in OVERWRITE mode, and the live aggregate is
    * `AggState.mergeRows(read(statePath))` — key-cardinality work at
    * read time, the raw stream never re-scanned. Unlike
    * [[toSketchState]] (HLL union is replay-tolerant by idempotence),
    * additive counters DO inflate under at-least-once replay, so the
    * epoch-keyed overwrite is load-bearing here: a replayed epoch
    * rewrites its own partition byte-for-byte instead of appending a
    * second copy (the E11 corpus-cards contract). */
  def toAggState(
      events: DataFrame,
      keys: Seq[String],
      valueCols: Seq[String],
      statePath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], epochId: Long) =>
        aggStateBatch(batch.toDF(), epochId, keys, valueCols, statePath)
      }
      .start()

  /** Streaming drift-state maintenance: each micro-batch's (slice,
    * bin) quality-histogram cells land under `batch=<epochId>` in
    * overwrite mode (additive counters — the same replay contract as
    * [[toAggState]]); the live drift report is
    * `CorpusStats.qualityDriftFromCells(read(cellsPath))`, computed
    * from key-cardinality state without re-scanning any batch. The
    * streaming half of D52: continuous ingestion with a PSI alarm per
    * source. */
  def toDriftCells(
      docs: DataFrame,
      slice: String,
      value: org.apache.spark.sql.Column,
      cellsPath: String,
      checkpoint: String,
      nBins: Int = 10, lo: Double = 0.0, hi: Double = 1.0): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], epochId: Long) =>
        driftCellsBatch(batch.toDF(), epochId, slice, value, cellsPath, nBins, lo, hi)
      }
      .start()

  /** One micro-batch of [[toDriftCells]], exposed for replay tests. */
  private[graft] def driftCellsBatch(
      batch: DataFrame,
      epochId: Long,
      slice: String,
      value: org.apache.spark.sql.Column,
      cellsPath: String,
      nBins: Int, lo: Double, hi: Double): Unit =
    graft.text.CorpusStats.driftCells(batch, col(slice), value, nBins, lo, hi)
      .write.mode("overwrite").parquet(s"$cellsPath/batch=$epochId")

  /** One micro-batch of [[toAggState]], exposed for replay tests. */
  private[graft] def aggStateBatch(
      batch: DataFrame,
      epochId: Long,
      keys: Seq[String],
      valueCols: Seq[String],
      statePath: String): Unit =
    graft.operators.AggState.state(batch, keys, valueCols)
      .write.mode("overwrite").parquet(s"$statePath/batch=$epochId")

  def toSketchState(
      events: DataFrame,
      keys: Seq[String],
      value: String,
      statePath: String,
      checkpoint: String,
      lgK: Int = graft.operators.Sketches.DefaultLgK): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.Sketches.sketchTable(batch, keys.map(col), col(value), lgK)
          .write.mode("append").parquet(statePath)
      }
      .start()

  /** Streaming COUNT-MIN frequency state (E17): each micro-batch lands
    * one `cmsketch` row per key group; any later point-frequency probe
    * rolls the stored state up with [[graft.operators.Sketches.cmRollup]]
    * and probes the merged bytes — raw traffic is never rescanned.
    *
    * Unlike [[toSketchState]] (HLL union is idempotent, so a replayed
    * batch that appends twice cannot change any estimate), count-min
    * merge ADDS counters — a blind append would double-count on
    * replay. Batches therefore land under `batch=<epochId>` in
    * OVERWRITE mode (the [[toSemanticDeduped]] epoch-keyed replay
    * contract): a replayed epoch rewrites identical files and every
    * rollup over the log stays exact. Compact on the Bronze lifecycle
    * by materializing [[graft.operators.Sketches.cmRollup]] output to a
    * fresh path — each physical row enters that rollup exactly once. */
  def toFrequencyState(
      events: DataFrame,
      keys: Seq[String],
      value: String,
      statePath: String,
      checkpoint: String,
      depth: Int = graft.expressions.CountMin.DefaultDepth,
      width: Int = graft.expressions.CountMin.DefaultWidth,
      seed: Int = graft.expressions.CountMin.DefaultSeed): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], epochId: Long) =>
        frequencyStateBatch(batch.toDF(), epochId, keys, value, statePath, depth, width, seed)
      }
      .start()

  /** One micro-batch of [[toFrequencyState]], exposed for replay tests. */
  private[graft] def frequencyStateBatch(
      batch: DataFrame,
      epochId: Long,
      keys: Seq[String],
      value: String,
      statePath: String,
      depth: Int, width: Int, seed: Int): Unit =
    graft.operators.Sketches.cmSketchTable(batch, keys.map(col), col(value), depth, width, seed)
      .write.mode("overwrite").parquet(s"$statePath/batch=$epochId")

  /** Streaming content-diff ingest (the streaming half of
    * [[graft.etl.SnapshotDiff]] A23): classify each arriving document
    * as `added` / `changed` / `unchanged` against the persisted
    * latest-digest index and record the change events — the re-crawl
    * shape, where the feed re-fetches known keys and the pipeline must
    * detect content drift to re-process ONLY what actually moved.
    * `removed` cannot exist here (a stream never retracts a key);
    * detecting removals is the batch [[graft.etl.SnapshotDiff.diff]]'s
    * job between materialized snapshots.
    *
    * The index is a change LOG, not a mutable table: each batch writes
    * its added/changed keys' (key, digest) rows under
    * `batch=<epochId>`; a key's current digest is the row from its
    * LATEST batch (`max_by` over the partition column — partial-agg
    * friendly, no windows). Unchanged keys write nothing, so the log
    * grows with change events, not with traffic. Reading the log is
    * the per-batch cost at 100 TB; compact it on the Bronze lifecycle
    * by materializing [[latestContentState]] to a fresh path
    * (the append-then-compact discipline of [[toSketchState]]).
    *
    * Replay safety: the [[toSemanticDeduped]] contract — both outputs
    * land under `batch=<epochId>` in OVERWRITE mode and the index read
    * excludes the current epoch, so a replayed batch is judged against
    * exactly the pre-batch state and rewrites identical files. */
  def toContentDiff(
      docs: DataFrame,
      id: String,
      contentCols: Seq[String],
      outRoot: String,
      indexPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], epochId: Long) =>
        contentDiffBatch(batch.toDF(), epochId, id, contentCols, outRoot, indexPath)
      }
      .start()

  /** One micro-batch of [[toContentDiff]], exposed for replay tests:
    * running the same (batch, epochId) twice must leave identical
    * change events and index state. */
  private[graft] def contentDiffBatch(
      batch: DataFrame,
      epochId: Long,
      id: String,
      contentCols: Seq[String],
      outRoot: String,
      indexPath: String): Unit = {
    import graft.etl.SnapshotDiff
    // deterministic under duplicate keys within one batch (retried
    // fetches): collapse to the max digest before judging
    val cur = batch.select(col(id).as("key"),
        SnapshotDiff.digestOf(contentCols.map(batch(_))).as("digest"))
      .groupBy("key").agg(max("digest").as("digest"))
    val hPath = new org.apache.hadoop.fs.Path(indexPath)
    val fs = hPath.getFileSystem(batch.sparkSession.sessionState.newHadoopConf())
    val prior =
      if (fs.exists(hPath))
        batch.sparkSession.read.parquet(indexPath)
          .filter(col("batch") =!= lit(epochId))
          .groupBy("key").agg(max_by(col("digest"), col("batch")).as("digest"))
      else cur.limit(0)
    val classified = cur
      .join(prior.withColumnRenamed("digest", "prev_digest"), Seq("key"), "left_outer")
      .withColumn("change",
        when(col("prev_digest").isNull, lit("added"))
          .when(col("prev_digest") === col("digest"), lit("unchanged"))
          .otherwise(lit("changed")))
      .select("key", "change", "digest")
    classified.persist()
    try {
      classified.write.mode("overwrite").parquet(s"$outRoot/batch=$epochId")
      classified.filter(col("change") =!= lit("unchanged")).select("key", "digest")
        .write.mode("overwrite").parquet(s"$indexPath/batch=$epochId")
    } finally classified.unpersist()
  }

  /** The current (key, digest) state of a [[toContentDiff]] index:
    * latest-batch-wins per key. Materialize this to a fresh path and
    * repoint the sink to compact the change log. */
  def latestContentState(spark: SparkSession, indexPath: String): DataFrame =
    spark.read.parquet(indexPath)
      .groupBy("key").agg(max_by(col("digest"), col("batch")).as("digest"))

  /** Streaming balanced-shard writer — [[graft.operators.Packing
    * .assignBalancedShards]]'s cross-batch form: training shards must
    * stay token-balanced over the WHOLE stream, but a batch only sees
    * its own documents, so per-shard cumulative token totals persist
    * under `statePath` and each batch assigns serpentine over its
    * cost-descending rank INTO the lightest-first shard order (the
    * heaviest arriving document lands on the currently lightest
    * shard — streaming LPT). Deterministic given (prior state, batch):
    * no RNG, total order on both ranks. The rank window runs over one
    * micro-batch, not the stream.
    *
    * Replay: assignments land under `outRoot/batch=<epochId>` and the
    * batch's per-shard token DELTAS under `statePath/batch=<epochId>`,
    * both OVERWRITE, state read excluding the replaying epoch — the
    * E9/E16 contract, so a replayed epoch recomputes the identical
    * assignment and rewrites identical files. Current per-shard loads =
    * sum of deltas over the log ([[shardLoads]]). */
  def toBalancedShards(
      docs: DataFrame,
      id: String,
      cost: Column,
      outRoot: String,
      statePath: String,
      checkpoint: String,
      shards: Int): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], epochId: Long) =>
        balancedShardBatch(batch.toDF(), epochId, id, cost, outRoot, statePath, shards)
      }
      .start()

  /** One micro-batch of [[toBalancedShards]], exposed for replay tests. */
  private[graft] def balancedShardBatch(
      batch: DataFrame,
      epochId: Long,
      id: String,
      cost: Column,
      outRoot: String,
      statePath: String,
      shards: Int): Unit = {
    require(shards >= 1, s"need shards >= 1, got $shards")
    val spark = batch.sparkSession
    import org.apache.spark.sql.expressions.Window
    val prior = priorIndex(spark, statePath, epochId,
      () => spark.range(0).select(col("id").cast("int").as("shard"), col("id").as("tokens")))
      .groupBy("shard").agg(sum("tokens").as("tokens"))
    // all S shards, zero-filled, ordered lightest-first → rank → the
    // serpentine target list (tiny: S rows, collected nowhere — joined)
    val loads = spark.range(shards).select(col("id").cast("int").as("shard"))
      .join(prior, Seq("shard"), "left")
      .withColumn("tokens", coalesce(col("tokens"), lit(0L)))
      .withColumn("__lr", row_number().over(
        Window.orderBy(col("tokens").asc, col("shard").asc)) - 1)
      .select(col("shard"), col("__lr"))
    val rk = row_number().over(Window.orderBy(col("__c").desc, col(id).asc))
    val pos = (rk - 1) % (2 * shards)
    val assigned = batch
      .withColumn("__c", cost.cast("long"))
      .withColumn("__pos", when(pos < shards, pos).otherwise(lit(2 * shards - 1) - pos))
      .join(broadcast(loads), col("__pos") === col("__lr"))
      .drop("__pos", "__lr")
    assigned.persist()
    try {
      assigned.drop("__c")
        .write.mode("overwrite").parquet(s"$outRoot/batch=$epochId")
      assigned.groupBy("shard").agg(sum("__c").as("tokens"))
        .write.mode("overwrite").parquet(s"$statePath/batch=$epochId")
    } finally assigned.unpersist()
  }

  /** Current per-shard token loads of a [[toBalancedShards]] state log. */
  def shardLoads(spark: SparkSession, statePath: String): DataFrame =
    spark.read.parquet(statePath)
      .groupBy("shard").agg(sum("tokens").as("tokens"))

  /** Streaming quality-gate ROUTER: per micro-batch, C4-clean each
    * document's lines ([[graft.text.C4Filter]]), gate the cleaned text
    * on the C4 page rules AND the Gopher quality rules
    * ([[graft.text.GopherFilter]]), then land BOTH outcomes — keeps
    * (with `text` replaced by the cleaned text) under `keepRoot`, and
    * rejects (ORIGINAL text, plus a `reject_reasons` array naming
    * every failed gate) under `rejectRoot`. The reject stream is the
    * operational half [[toCleanIngest]] drops silently: at corpus
    * scale the drop-rate per gate IS the crawl-health dashboard, and
    * gate-tuning needs the rejected documents inspectable, not gone.
    *
    * Stateless across batches (no persisted index), so replay
    * idempotency is just the epoch-keyed overwrite: re-running an
    * epoch rewrites `batch=<epochId>` under both roots byte-identically. */
  def toQualityRouted(
      docs: DataFrame,
      id: String,
      text: String,
      keepRoot: String,
      rejectRoot: String,
      checkpoint: String,
      minLineWords: Int = 5,
      minSentences: Int = 3,
      badWords: Seq[String] = Nil,
      minWords: Int = 50): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], epochId: Long) =>
        qualityRoutedBatch(batch.toDF(), epochId, id, text, keepRoot, rejectRoot,
          minLineWords, minSentences, badWords, minWords)
      }
      .start()

  /** One micro-batch of [[toQualityRouted]], exposed for replay tests. */
  private[graft] def qualityRoutedBatch(
      batch: DataFrame,
      epochId: Long,
      id: String,
      text: String,
      keepRoot: String,
      rejectRoot: String,
      minLineWords: Int,
      minSentences: Int,
      badWords: Seq[String],
      minWords: Int): Unit = {
    import graft.text.{C4Filter, GopherFilter}
    val judged = C4Filter.clean(batch, col(text), minLineWords, minSentences, badWords)
      .withColumn("__g", GopherFilter.flags(col("c4.clean_text"), minWords))
    val reasons = array_compact(array(
      when(!col("flags.ok_sentences"), lit("c4_sentences")),
      when(!col("flags.ok_lorem"), lit("c4_lorem")),
      when(!col("flags.ok_brace"), lit("c4_brace")),
      when(!col("flags.ok_bad_words"), lit("c4_bad_words")),
      when(!col("__g.ok_word_count"), lit("gopher_word_count")),
      when(!col("__g.ok_mean_word_len"), lit("gopher_mean_word_len")),
      when(!col("__g.ok_symbol_ratio"), lit("gopher_symbol_ratio")),
      when(!col("__g.ok_alpha_words"), lit("gopher_alpha_words")),
      when(!col("__g.ok_stop_words"), lit("gopher_stop_words")),
      when(!col("__g.ok_bullet_lines"), lit("gopher_bullet_lines")),
      when(!col("__g.ok_ellipsis_lines"), lit("gopher_ellipsis_lines"))))
    val routed = judged.withColumn("__reasons", reasons)
    routed.persist()
    try {
      routed.filter(col("flags.keep") && col("__g.keep"))
        .withColumn(text, col("c4.clean_text"))
        .drop("c4", "flags", "__g", "__reasons")
        .write.mode("overwrite").parquet(s"$keepRoot/batch=$epochId")
      routed.filter(!(col("flags.keep") && col("__g.keep")))
        .withColumn("reject_reasons", col("__reasons"))
        .drop("c4", "flags", "__g", "__reasons")
        .write.mode("overwrite").parquet(s"$rejectRoot/batch=$epochId")
    } finally routed.unpersist()
  }


  // Typed rows for the StreamOpsStateful operators — kept on the
  // (static) object: nesting them in the trait would give each an
  // outer pointer and break product encoders.
  final case class ScoreEvent(user_id: Long, ts: Timestamp, value: Double)
  final case class ZState(recent: List[Double])
  final case class ZAlert(user_id: Long, ts: Timestamp, value: Double, z: Double)
  final case class TypedEvent(user_id: Long, ts: Timestamp, event_type: String)
  final case class CepState(pending: List[(Long, String)], tail: String)
  final case class CepMatch(user_id: Long, n_new_matches: Long, matched_through: Timestamp)
  final case class SilenceState(lastSeenMs: Long)
  final case class SilenceAlert(user_id: Long, last_seen: Timestamp, gap_sec: Long)
}
