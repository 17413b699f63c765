package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // 3 days × 200 users with heavy cross-day overlap (users repeat daily)
  private lazy val events = (0 until 600).map { i =>
    (s"2024-01-0${i % 3 + 1}", s"user_${i % 200}", if (i % 2 == 0) "click" else "view")
  }.toDF("day", "user_id", "event_type")

  test("sketch table has one row per (group, bucket)") {
    val t = Sketches.sketchTable(events, Seq(col("event_type"), col("day")), col("user_id"))
    assert(t.count() == 6) // 2 types × 3 days
    assert(t.columns.toSeq == Seq("event_type", "day", "sketch"))
  }

  test("union of per-day sketches equals one global sketch (lossless merge)") {
    val daily = Sketches.sketchTable(events, Seq(col("event_type"), col("day")), col("user_id"))
    val rolled = Sketches.unionEstimate(daily, Seq(col("event_type")))
      .select("event_type", "n_estimate").as[(String, Long)].collect().toMap
    val direct = events.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), Sketches.DefaultLgK)).as("e"))
      .select("event_type", "e").as[(String, Long)].collect().toMap
    assert(rolled == direct,
      s"union-of-buckets must reproduce the full-scan sketch exactly: $rolled vs $direct")
  }

  test("sketch tables are incremental Gold state through Medallion (parquet round-trip)") {
    import graft.etl.Medallion
    val dir = java.nio.file.Files.createTempDirectory("graft-sketch-gold")
    val silver = dir.resolve("silver").toString
    val gold = dir.resolve("gold").toString
    events.withColumn(Medallion.PartitionCol, col("day"))
      .write.partitionBy(Medallion.PartitionCol).parquet(silver)
    // Gold stage per partition: that day's sketch table — kilobytes of
    // state instead of the day's raw rows
    val done = Medallion.runIncremental(spark, silver, gold,
      df => Sketches.sketchTable(df, Seq(col("event_type")), col("user_id")))
    assert(done.size == 3)
    // rollup reads ONLY the stored sketches (never the raw events) and
    // must still reproduce the full-scan estimate exactly
    val rolled = Sketches.unionEstimate(spark.read.parquet(gold), Seq(col("event_type")))
      .select("event_type", "n_estimate").as[(String, Long)].collect().toMap
    val direct = events.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), Sketches.DefaultLgK)).as("e"))
      .select("event_type", "e").as[(String, Long)].collect().toMap
    assert(rolled == direct)
    // a late partition refreshes only its own sketch
    Seq(("2024-01-09", "user_999", "click")).toDF("day", "user_id", "event_type")
      .withColumn(Medallion.PartitionCol, col("day"))
      .write.mode("append").partitionBy(Medallion.PartitionCol).parquet(silver)
    val again = Medallion.runIncremental(spark, silver, gold,
      df => Sketches.sketchTable(df, Seq(col("event_type")), col("user_id")))
    assert(again == Seq("2024-01-09"))
  }

  test("estimate lands within the lgK=12 error bound of exact") {
    val daily = Sketches.sketchTable(events, Seq(col("event_type"), col("day")), col("user_id"))
    val rolled = Sketches.unionEstimate(daily, Seq(col("event_type")))
      .select("event_type", "n_estimate").as[(String, Long)].collect().toMap
    // 100 distinct users per type; 1.6% rse → 5% is > 3σ
    rolled.values.foreach(e => assert(math.abs(e - 100.0) / 100.0 < 0.05))
  }
}
