package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins Spark's runtime Bloom-filter join pruning: when a large fact
  * sort-merge-joins a selectively filtered build side, the optimizer
  * injects a `bloom_filter_agg` on the build side and a
  * `might_contain` predicate on the FACT SCAN side — rows that cannot
  * match are dropped before the shuffle, the at-scale difference
  * between shuffling 100 TB and shuffling the matching percent. Size
  * thresholds are lowered to trigger at test scale (the mechanism is
  * identical; production defaults gate it to ≥10 GB application
  * sides), and file-based relations are required — the filter hangs
  * off scan statistics. */
class RuntimeFilterSpec extends SparkSpec {

  test("a selective join injects a bloom filter on the fact side") {
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // production gate: only bother for big application-side scans;
      // zeroed here so the 1M-row test fact qualifies
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // keep the join sort-merge: a broadcast join prunes via its own
      // mechanism and no bloom filter would be (or need to be) injected
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    try {
      spark.range(1000000)
        .select(col("id").as("k"), (col("id") % 1000).as("v"))
        .write.parquet(s"$dir/fact")
      spark.range(10000)
        .select(col("id").as("k"), (col("id") % 50).as("cat"))
        .write.parquet(s"$dir/dim")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("cat") === 7)
      val joined = fact.join(dim, "k")
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") && optimized.contains("might_contain"),
        s"no runtime bloom filter injected — optimized plan:\n$optimized")
      // the filtered dim keeps every 50th key → exactly 200 join rows
      assert(joined.count() == 200)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
