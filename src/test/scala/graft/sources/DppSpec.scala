package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

/** C38 — partition-layout pruning over the A24 sink, STATIC and
  * DYNAMIC. The 100-TB contract these tests pin: a date-partitioned
  * fact table must never be fully scanned when (a) the query filters
  * on the partition column directly, or (b) the filter arrives
  * indirectly through a join with a filtered dimension (dynamic
  * partition pruning — Spark injects the dim's partition-key set as a
  * runtime subquery filter into the fact scan, reusing the join's
  * broadcast). If either regresses, every daily incremental job pays a
  * full-history scan.
  */
class DppSpec extends SparkSpec {
  import spark.implicits._

  // the shared production walker — keeping one copy means an AQE
  // wrapper-node change can't make this spec and the graded c38/c65
  // rows disagree about whether DPP pruned
  private def factScans(p: SparkPlan, path: String): Seq[FileSourceScanExec] =
    graft.LayoutQueries.factScans(p, path)

  private lazy val root: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    val fact = spark.range(0, 1000).select(
      col("id"), (col("id") % 10).cast("int").as("day"),
      (col("id") % 97).cast("double").as("v"))
    PartitionedSink.overwritePartitions(fact, dir, Seq("day"))
    dir
  }

  test("static pruning: a partition-column filter reads only that partition's files") {
    val df = spark.read.parquet(root).filter(col("day") === 3)
    assert(df.collect().length === 100)
    val scan = factScans(df.queryExecution.executedPlan, root).head
    assert(scan.metrics("numFiles").value === 1L,
      s"expected 1 of 10 partition files, read ${scan.metrics("numFiles").value}")
  }

  test("dynamic pruning: a filtered-dim join prunes fact partitions at runtime") {
    // the dim must be a FILE source: a local relation's filter constant-
    // folds into the relation during optimization, and DPP's selective-
    // predicate check then sees no Filter to justify pruning
    val dimPath = root + "-dim"
    Seq((0, "keep"), (1, "keep"), (2, "drop"), (3, "drop"), (4, "drop"),
      (5, "drop"), (6, "drop"), (7, "drop"), (8, "drop"), (9, "drop"))
      .toDF("day", "tag").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val fact = spark.read.parquet(root)
    val joined = fact.join(dim.filter(col("tag") === "keep"), Seq("day"))
    assert(joined.collect().length === 200)
    val plan = joined.queryExecution.executedPlan
    assert(plan.toString.contains("dynamicpruning"),
      "fact scan must carry a runtime dynamicpruning subquery filter")
    val scan = factScans(plan, root).head
    assert(scan.metrics("numFiles").value === 2L,
      s"DPP must read 2 of 10 partitions, read ${scan.metrics("numFiles").value}")
  }

  test("no false pruning: an unfiltered dim join reads everything and loses nothing") {
    val dim = (0 until 10).map(d => (d, s"t$d")).toDF("day", "tag")
    val joined = spark.read.parquet(root).join(dim, Seq("day"))
    assert(joined.count() === 1000L)
  }
}
