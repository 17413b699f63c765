package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomIndexSpec extends SparkSpec {
  import spark.implicits._

  // 20 files of 50 rows each; user u<i> lives ONLY in file i (unsorted
  // high-cardinality id column — footer min/max prunes nothing here)
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-bloomidx").toString
    (0 until 20).foreach { f =>
      (0 until 50).map(r => (s"u${f}_$r", f.toLong * 1000 + r, s"payload$r"))
        .toDF("user", "seq", "payload")
        .coalesce(1).write.mode("append").parquet(d)
    }
    d
  }

  private lazy val index = BloomIndex.build(spark, dir, "user",
    expectedPerFile = 100, fpp = 0.01).cache()

  test("sidecar has one row per file") {
    assert(index.count() === 20L)
  }

  test("candidateFiles: never misses, few false positives") {
    val cands = BloomIndex.candidateFiles(index, "u7_13")
    assert(cands.nonEmpty, "the true file must survive")
    assert(cands.length <= 3, s"fpp=0.01 over 20 files should keep ~1, got ${cands.length}")
    // the surviving file really holds the row
    val rows = spark.read.option("basePath", dir).parquet(cands: _*)
      .filter(col("user") === "u7_13").count()
    assert(rows === 1L)
  }

  test("prunedRead equals the full-scan filter; absent keys open zero or fp-only files") {
    val got = BloomIndex.prunedRead(spark, dir, "user", "u3_49", index)
      .select("user", "seq").as[(String, Long)].collect().toSeq
    val want = spark.read.parquet(dir).filter(col("user") === "u3_49")
      .select("user", "seq").as[(String, Long)].collect().toSeq
    assert(got === want && got.length === 1)
    val absent = BloomIndex.prunedRead(spark, dir, "user", "no_such_user", index)
    assert(absent.count() === 0L)
    assert(absent.schema.fieldNames.toSeq === spark.read.parquet(dir).schema.fieldNames.toSeq)
  }

  test("lookup opens a bounded file subset, not the table") {
    val pruned = BloomIndex.prunedRead(spark, dir, "user", "u11_0", index)
    pruned.collect()
    val scans = graft.PlanShapes.walk(pruned.queryExecution.executedPlan)
    assert(scans.scans <= 1, "one surviving scan node")
    val opened = BloomIndex.candidateFiles(index, "u11_0").length
    assert(opened <= 3, s"opened $opened of 20 files")
  }

  test("candidateFiles: an over-sized sidecar fails loud, never OOMs the driver") {
    // files x bloom-size driver bytes is the real bound; a synthetic
    // index past MaxSidecarFiles must refuse with compaction advice
    val big = spark.range(BloomIndex.MaxSidecarFiles + 1)
      .select(concat(lit("f"), col("id")).as("file"),
        lit(Array[Byte](1, 2, 3)).as("bloom"))
    val ex = intercept[IllegalArgumentException] {
      BloomIndex.candidateFiles(big, "v")
    }
    assert(ex.getMessage.contains("Compact the table first"), ex.getMessage)
  }
}
