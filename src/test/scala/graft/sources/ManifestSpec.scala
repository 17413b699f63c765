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

  test("prunedRead on a z-ordered layout opens fewer files than the naive scan") {
    val dir = java.nio.file.Files.createTempDirectory("manifest4").toString
    val df = (0L until 4000L).map(i => (i, (i * 37) % 1000, i.toDouble / 40))
      .toDF("id", "k", "score")
    Zorder.writeZOrdered(df, dir,
      Zorder.zValue(Seq(
        Zorder.normalize(col("id"), 0, 4000, 10),
        Zorder.normalize(col("k"), 0, 1000, 10)), 10),
      nFiles = 16)
    val totalFiles = spark.read.parquet(dir).inputFiles.length
    assert(totalFiles >= 8, s"layout produced only $totalFiles files")
    val manifest = Manifest.build(spark, dir, Seq("id", "k"))
    val out = Manifest.prunedRead(spark, dir, "id", 100, 220, Some(manifest))
    // correctness: identical rows to the naive full-scan filter
    val naive = spark.read.parquet(dir)
      .filter(col("id") >= 100 && col("id") <= 220)
      .select("id").as[Long].collect().sorted.toSeq
    assert(out.select("id").as[Long].collect().sorted.toSeq == naive && naive.length == 121)
    // efficiency: the executed plan touches a strict subset of the files
    val opened = out.inputFiles.length
    assert(opened < totalFiles, s"opened $opened of $totalFiles — nothing pruned")
    // fully-disjoint interval: zero data files, schema preserved
    val empty = Manifest.prunedRead(spark, dir, "id", 1e7, 2e7, Some(manifest))
    assert(empty.isEmpty && empty.columns.toSeq == Seq("id", "k", "score"))
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
