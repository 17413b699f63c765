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

  // ---- KLL quantile sketch tables (C8d) ----

  // 3 groups × 4 buckets × 500 values: group g holds 0..1999 scaled by (g+1)
  private lazy val measures = (0 until 6000).map { i =>
    val g = i % 3
    (s"g$g", s"b${i % 4}", ((i / 3) % 2000).toDouble * (g + 1))
  }.toDF("grp", "bucket", "v")

  test("quantile sketch table + rollup recover known quantiles within rank bound") {
    val t = Sketches.quantileSketchTable(measures, Seq(col("grp"), col("bucket")), col("v"))
    assert(t.count() == 12)
    assert(t.columns.toSeq == Seq("grp", "bucket", "qsketch"))
    val rolled = Sketches.quantileRollup(t, Seq(col("grp")), Seq(0.5, 0.95))
      .select("grp", "p50", "p95", "n_buckets")
      .as[(String, Double, Double, Long)].collect().map(r => r._1 -> r).toMap
    assert(rolled.values.forall(_._4 == 4L))
    // group g is uniform on [0, 2000·(g+1)): true p50 = 1000·(g+1),
    // p95 = 1900·(g+1); k=200 rank error ~1.65% → accept 3% of range
    for (g <- 0 until 3; scale = (g + 1).toDouble) {
      val (_, p50, p95, _) = rolled(s"g$g")
      assert(math.abs(p50 - 1000 * scale) <= 0.03 * 2000 * scale, s"p50 g$g: $p50")
      assert(math.abs(p95 - 1900 * scale) <= 0.03 * 2000 * scale, s"p95 g$g: $p95")
    }
  }

  test("quantile sketches survive a parquet round-trip and union losslessly-in-bound") {
    val dir = java.nio.file.Files.createTempDirectory("graft-kll").toString
    Sketches.quantileSketchTable(measures, Seq(col("grp"), col("bucket")), col("v"))
      .write.mode("overwrite").parquet(dir)
    val p50 = Sketches.quantileRollup(spark.read.parquet(dir), Seq(col("grp")), Seq(0.5))
      .filter(col("grp") === "g0").select("p50").as[Double].head()
    assert(math.abs(p50 - 1000.0) <= 60.0)
  }

  // ---- Theta sketch tables (C8e): set algebra on sketch state ----

  test("theta sketches: exact-mode set algebra on overlapping user sets") {
    // click users 0..149, view users 100..249 → |∩|=50, |∪|=250, |click\view|=100
    val ev = ((0 until 150).map(u => (s"u$u", "click")) ++
      (100 until 250).map(u => (s"u$u", "view"))).toDF("user_id", "event_type")
    val t = Sketches.thetaSketchTable(ev, Seq(col("event_type")), col("user_id"))
    val row = t.agg(
        max(when(col("event_type") === "click", col("tsketch"))).as("a"),
        max(when(col("event_type") === "view", col("tsketch"))).as("b"))
      .select(
        Sketches.thetaSetEstimate("intersect", col("a"), col("b")).as("i"),
        Sketches.thetaSetEstimate("union", col("a"), col("b")).as("u"),
        Sketches.thetaSetEstimate("diff", col("a"), col("b")).as("d"))
      .as[(Long, Long, Long)].head()
    assert(row == ((50L, 250L, 100L))) // below 4096 entries → exact
  }

  test("theta union rollup survives parquet and matches a direct sketch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-theta").toString
    Sketches.thetaSketchTable(events, Seq(col("event_type"), col("day")), col("user_id"))
      .write.mode("overwrite").parquet(dir)
    val rolled = Sketches.thetaRollup(spark.read.parquet(dir), Seq(col("event_type")))
    val est = rolled.select(col("event_type"),
        Sketches.thetaSetEstimate("union", col("tsketch"), col("tsketch")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(est.values.forall(_ == 100L)) // 100 distinct users per type, exact mode
    assert(rolled.select("n_buckets").as[Long].collect().forall(_ == 3L))
  }

  test("theta estimation mode stays within bounds past the nominal entry count") {
    // 20k distinct longs at lgK=12 (4096 nominal) → sampling mode
    val big = spark.range(20000).select(col("id"))
    val est = big.agg(graft.expressions.ThetaExpressions.thetaSketchAgg(col("id")).as("s"))
      .select(Sketches.thetaSetEstimate("union", col("s"), col("s")).as("n"))
      .as[Long].head()
    assert(math.abs(est - 20000.0) / 20000.0 < 0.05, s"estimate $est") // rse ~1.6%, 5% > 3σ
  }

  // ---- approx_top_k frequent-items sketch tables (C8f) ----

  test("top-k sketch table: bucket-combined heavy hitters match exact counts") {
    // zipf-ish: item i appears 2^i times → unambiguous top-3 = 7,6,5
    val freq = (0 to 7).flatMap(i => Seq.fill(1 << i)(i)).toDF("item")
      .withColumn("bucket", (monotonically_increasing_id() % 4).cast("int"))
    val t = Sketches.topKSketchTable(freq, Seq(col("bucket")), col("item"), maxItemsTracked = 100)
    assert(t.count() == 4)
    val top = Sketches.topKRollup(t, Seq.empty, k = 3)
      .orderBy(desc("n_estimate"), col("item"))
      .select("item", "n_estimate").as[(Int, Long)].collect().toSeq
    // maxItemsTracked >= distinct items → exact counts
    assert(top == Seq((7, 128L), (6, 64L), (5, 32L)))
  }

  test("top-k sketches survive parquet round-trips") {
    val freq = (0 to 7).flatMap(i => Seq.fill(1 << i)(i)).toDF("item")
      .withColumn("bucket", (col("item") % 2).cast("int"))
    val dir = java.nio.file.Files.createTempDirectory("graft-topk").toString
    Sketches.topKSketchTable(freq, Seq(col("bucket")), col("item"), maxItemsTracked = 100)
      .write.mode("overwrite").parquet(dir)
    val top = Sketches.topKRollup(spark.read.parquet(dir), Seq.empty, k = 1)
      .select("item", "n_estimate").as[(Int, Long)].head()
    assert(top == ((7, 128L)))
  }

  test("empty-input KLL aggregates yield null sketches, not failures") {
    val empty = measures.filter(col("grp") === "nope")
    val t = Sketches.quantileSketchTable(empty, Seq(col("grp")), col("v"))
    assert(t.count() == 0)
    val one = measures.limit(0)
      .agg(graft.expressions.SketchExpressions.kllSketchAgg(col("v")).as("s"))
      .select(col("s").isNull).as[Boolean].head()
    assert(one) // global agg over zero rows → null sketch blob
  }
}
