package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ManifestSpec extends SparkSpec {
  import spark.implicits._

  test("build reads footer stats; candidateFiles prunes disjoint files") {
    val dir = java.nio.file.Files.createTempDirectory("manifest").toString
    // range-sorted layout: 4 files covering ids [0,250), [250,500), ...
    (0L until 1000L).map(i => (i, i.toDouble / 10, s"r$i")).toDF("id", "score", "s")
      .repartitionByRange(4, col("id"))
      .write.mode("overwrite").parquet(dir)
    val m = Manifest.build(spark, dir, Seq("id", "score"))
    val rows = m.collect()
    assert(rows.map(_.getString(0)).distinct.length == 4)
    assert(rows.forall(!_.getBoolean(5))) // no nulls anywhere
    // total rows accounted once per column
    assert(m.filter(col("column") === "id").agg(sum("n_rows")).head().getLong(0) == 1000L)
    // a narrow id interval hits exactly one file
    val cand = Manifest.candidateFiles(m, "id", 300, 310)
    assert(cand.length == 1, s"expected 1 candidate, got ${cand.length}")
    // and reading just the candidates matches the full-scan filter
    val pruned = spark.read.parquet(cand: _*).filter(col("id").between(300, 310))
      .select("id").as[Long].collect().toSet
    assert(pruned == (300L to 310L).toSet)
    // boundary interval spanning two files → two candidates
    assert(Manifest.candidateFiles(m, "id", 240, 260).length == 2)
    // the double column prunes too
    assert(Manifest.candidateFiles(m, "score", 0.0, 1.0).length == 1)
  }

  test("build walks Hive-partitioned layouts recursively") {
    val dir = java.nio.file.Files.createTempDirectory("manifest3").toString
    (0L until 100L).map(i => (i, if (i < 50) "a" else "b")).toDF("id", "part")
      .repartitionByRange(2, col("id"))
      .write.mode("overwrite").partitionBy("part").parquet(dir)
    val m = Manifest.build(spark, dir, Seq("id"))
    assert(m.count() > 0, "partitioned layout must not yield an empty manifest")
    assert(m.agg(sum("n_rows")).head().getLong(0) == 100L)
    // id>=50 lives only under part=b — its files prune away for [0, 10]
    val cand = Manifest.candidateFiles(m, "id", 0, 10)
    assert(cand.nonEmpty && cand.forall(_.contains("part=a")))
  }

  test("null bounds (stat-less) files are kept, never pruned") {
    val dir = java.nio.file.Files.createTempDirectory("manifest2").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.mode("overwrite").parquet(dir)
    val m = Manifest.build(spark, dir, Seq("id"))
      .withColumn("min_val", lit(null).cast("double")) // simulate missing stats
    val cand = Manifest.candidateFiles(m, "id", 1000, 2000)
    assert(cand.nonEmpty) // unknown bounds ⇒ must read
  }
}
