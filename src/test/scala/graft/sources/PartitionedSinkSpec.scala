package graft.sources

import graft.SparkSpec
import java.nio.file.Files

class PartitionedSinkSpec extends SparkSpec {
  import spark.implicits._

  test("overwritePartitions replaces only the partitions present in the batch") {
    val root = Files.createTempDirectory("psink").toString
    PartitionedSink.overwritePartitions(
      Seq(("2024-01-01", 1L, "a"), ("2024-01-01", 2L, "b"), ("2024-01-02", 3L, "c"))
        .toDF("day", "id", "v"),
      root, Seq("day"))
    // re-run day 2 with corrected content; day 1 must survive untouched
    PartitionedSink.overwritePartitions(
      Seq(("2024-01-02", 3L, "c2"), ("2024-01-02", 4L, "d")).toDF("day", "id", "v"),
      root, Seq("day"))
    val got = spark.read.parquet(root).select("day", "id", "v")
      .as[(String, Long, String)].collect().toSet
    assert(got == Set(
      ("2024-01-01", 1L, "a"), ("2024-01-01", 2L, "b"),
      ("2024-01-02", 3L, "c2"), ("2024-01-02", 4L, "d")))
  }

  test("a re-run of the same batch is idempotent (no double rows)") {
    val root = Files.createTempDirectory("psink").toString
    val batch = Seq(("2024-01-01", 1L, "a"), ("2024-01-02", 2L, "b")).toDF("day", "id", "v")
    PartitionedSink.overwritePartitions(batch, root, Seq("day"))
    PartitionedSink.overwritePartitions(batch, root, Seq("day"))
    assert(spark.read.parquet(root).count() == 2)
  }

  test("each partition lands in at most nShards parquet files") {
    val root = Files.createTempDirectory("psink").toString
    val rows = (1 to 400).map(i => (s"2024-01-0${1 + i % 2}", i.toLong, s"v$i"))
    PartitionedSink.overwritePartitions(rows.toDF("day", "id", "v"), root, Seq("day"), nShards = 3)
    Seq("2024-01-01", "2024-01-02").foreach { day =>
      val files = new java.io.File(s"$root/day=$day").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(files >= 1 && files <= 3, s"partition $day landed in $files files")
    }
    assert(spark.read.parquet(root).count() == 400)
  }

  test("input validation: partition columns and data columns are required") {
    val df = Seq(("a", 1L)).toDF("day", "id")
    intercept[IllegalArgumentException] {
      PartitionedSink.overwritePartitions(df, "/tmp/x", Nil)
    }
    intercept[IllegalArgumentException] {
      PartitionedSink.overwritePartitions(df.select("day"), "/tmp/x", Seq("day"))
    }
  }
}
