package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Medallion (Bronze → Silver → Gold) incremental runner.
  *
  * Re-expresses the reference's idempotent partition processing
  * (reference: transform/clean_transform.py:27-66 — discover
  * `ingestion_date=*` partitions, skip those with a `.done` marker,
  * transform, append Hive-partitioned output, write the marker;
  * analytics/kpis.py:27-52 runs the same pattern Silver→Gold).
  *
  * Scale notes: partition discovery is a driver-side directory listing
  * (cheap); each partition is processed as an independent Spark job, so
  * a 100 TB backfill parallelizes per-partition and a failed run resumes
  * exactly where it stopped — the marker is written only after a
  * successful write, and reprocessing an unmarked partition overwrites
  * its own output (idempotent).
  */
object Medallion {

  val PartitionCol = "ingestion_date"

  /** Partition values under `root` laid out Hive-style
    * (`ingestion_date=YYYY-MM-DD`). */
  def listPartitions(root: String): Seq[String] = {
    val p = Paths.get(root)
    if (!Files.exists(p)) Seq.empty
    else {
      val stream = Files.list(p) // close it: each leaked stream holds a directory fd
      try stream.iterator().asScala
        .filter(f => Files.isDirectory(f) && f.getFileName.toString.startsWith(s"$PartitionCol="))
        .map(_.getFileName.toString.stripPrefix(s"$PartitionCol="))
        .toSeq.sorted
      finally stream.close()
    }
  }

  private def marker(outRoot: String, value: String) =
    Paths.get(outRoot, s".done_$value")

  def isDone(outRoot: String, value: String): Boolean =
    Files.exists(marker(outRoot, value))

  /** Process every not-yet-done partition of `inRoot` with `transform`,
    * writing Hive-partitioned parquet under `outRoot` and marking each
    * partition `.done`. Returns the partition values processed this run.
    *
    * `read` defaults to a parquet scan; pass e.g.
    * `(s, p) => Tables.readJson(s, p, schema)` when the Bronze layer is
    * raw JSON (the reference's layout, fetch_movies.py:37-45).
    *
    * `parallelism` bounds CONCURRENT job submission: each partition is
    * its own Spark job, and serial submission leaves executors idle
    * whenever one small partition's job cannot fill the cluster — a
    * 1,000-partition backfill should keep `parallelism` jobs in flight
    * (Spark's scheduler interleaves their stages; FAIR mode shares
    * evenly). Default 1 preserves strictly ordered, easiest-to-reason
    * processing for day-to-day incremental runs where `todo` is small.
    * Markers are written per successful partition even when a sibling
    * fails, so a failed parallel backfill resumes exactly where it
    * stopped; the first failure rethrows after in-flight work settles.
    */
  def runIncremental(
      spark: SparkSession,
      inRoot: String,
      outRoot: String,
      transform: DataFrame => DataFrame,
      read: (SparkSession, String) => DataFrame = (s, p) => s.read.parquet(p),
      parallelism: Int = 1): Seq[String] = {
    require(parallelism >= 1, "parallelism must be >= 1")
    Files.createDirectories(Paths.get(outRoot))
    val todo = listPartitions(inRoot).filterNot(isDone(outRoot, _))
    def processOne(value: String): Unit = {
      val in = read(spark, s"$inRoot/$PartitionCol=$value")
      val out = transform(in)
      // Overwrite just this partition dir: idempotent re-run before the
      // marker lands never duplicates rows.
      out.write.mode("overwrite").parquet(s"$outRoot/$PartitionCol=$value")
      Files.createFile(marker(outRoot, value))
    }
    if (parallelism == 1 || todo.size <= 1) todo.foreach(processOne)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(parallelism, todo.size))
      try {
        val futures = todo.map(v => pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = processOne(v)
        }))
        // settle EVERY in-flight partition before surfacing the first
        // failure (in todo order) — successful siblings must finish and
        // commit their markers even when an earlier partition failed
        val outcomes = futures.map { f =>
          try { f.get(); None }
          catch { case e: java.util.concurrent.ExecutionException => Some(e.getCause) }
        }
        outcomes.flatten.headOption.foreach(throw _)
      } finally pool.shutdown()
    }
    todo
  }

  /** Write a DataFrame Hive-partitioned by `ingestion_date` (the
    * reference's Bronze layout, fetch_movies.py:37-45). */
  def writePartitioned(df: DataFrame, outRoot: String): Unit =
    df.write.mode("append").partitionBy(PartitionCol).parquet(outRoot)
}
