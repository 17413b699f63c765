package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class MedallionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-medallion").resolve("data").toString

  test("runIncremental processes each partition exactly once (.done markers)") {
    val bronze = tmp()
    val silver = tmp()
    Seq((1L, "2024-01-01"), (2L, "2024-01-01"), (3L, "2024-01-02"))
      .toDF("id", Medallion.PartitionCol)
      .write.partitionBy(Medallion.PartitionCol).parquet(bronze)

    val first = Medallion.runIncremental(spark, bronze, silver, df => df.withColumn("x", col("id") * 2))
    assert(first == Seq("2024-01-01", "2024-01-02"))

    // idempotent: nothing left to do
    val second = Medallion.runIncremental(spark, bronze, silver, identity)
    assert(second.isEmpty)

    // late-arriving partition picked up, earlier ones untouched
    Seq((4L, "2024-01-03")).toDF("id", Medallion.PartitionCol)
      .write.mode("append").partitionBy(Medallion.PartitionCol).parquet(bronze)
    val third = Medallion.runIncremental(spark, bronze, silver, df => df.withColumn("x", col("id") * 2))
    assert(third == Seq("2024-01-03"))

    val out = spark.read.parquet(s"$silver/${Medallion.PartitionCol}=2024-01-01")
    assert(out.select(sum("x")).as[Long].head() == 6L)
  }

  test("partition filters prune the Hive layout at the scan") {
    val root = tmp()
    Seq((1L, "2024-01-01"), (2L, "2024-01-02"), (3L, "2024-01-03"))
      .toDF("id", Medallion.PartitionCol)
      .write.partitionBy(Medallion.PartitionCol).parquet(root)
    val q = spark.read.parquet(root).filter(col(Medallion.PartitionCol) === "2024-01-02")
    val scan = q.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    assert(scan.partitionFilters.nonEmpty, "partition filter did not reach the scan")
    assert(scan.relation.location.inputFiles.length == 3) // layout has 3 partitions...
    assert(q.count() == 1) // ...but only one is read
  }

  test("re-run after failed marker write overwrites, never duplicates") {
    val bronze = tmp()
    val silver = tmp()
    Seq((1L, "2024-01-01")).toDF("id", Medallion.PartitionCol)
      .write.partitionBy(Medallion.PartitionCol).parquet(bronze)
    Medallion.runIncremental(spark, bronze, silver, identity)
    // simulate a crashed run: delete the marker, rerun
    Files.delete(java.nio.file.Paths.get(silver, ".done_2024-01-01"))
    Medallion.runIncremental(spark, bronze, silver, identity)
    assert(spark.read.parquet(s"$silver/${Medallion.PartitionCol}=2024-01-01").count() == 1)
  }
}
