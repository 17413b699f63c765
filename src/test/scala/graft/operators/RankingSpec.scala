package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RankingSpec extends SparkSpec {
  import spark.implicits._

  test("globalRank matches window row_number on a total order") {
    val df = spark.range(0, 1000).select(
      (col("id") * 2654435761L % 1000).as("v"), col("id"))
      .repartition(7)
    val got = Ranking.globalRank(df, Seq(col("v").desc, col("id").asc), "r", numPartitions = 5)
      .select(col("id"), col("r"))
    val want = df.withColumn("r",
        row_number().over(Window.orderBy(col("v").desc, col("id").asc)).cast("long"))
      .select(col("id"), col("r"))
    assert(got.collect().toSet === want.collect().toSet)
  }

  test("globalRank survives empty input and empty range partitions") {
    val empty = spark.range(0).select(col("id"))
    assert(Ranking.globalRank(empty, Seq(col("id").asc)).count() === 0L)
    // 3 distinct values into 8 requested partitions → most are empty
    val tiny = spark.range(3).select(col("id"))
    val r = Ranking.globalRank(tiny, Seq(col("id").asc), "r", numPartitions = 8)
    assert(r.orderBy("id").select("r").as[Long].collect().toSeq === Seq(1L, 2L, 3L))
  }

  test("ntileExact is bit-identical to the ntile window function") {
    for ((rows, buckets) <- Seq((1003, 10), (1000, 10), (7, 10), (10, 3), (1, 1))) {
      val df = spark.range(0, rows).select(
        (col("id") * 48271L % 10007).as("v"), col("id")).repartition(5)
      val got = Ranking.ntileExact(df, Seq(col("v").asc, col("id").asc), buckets, "b")
        .select(col("id"), col("b"))
      val want = df.withColumn("b",
          ntile(buckets).over(Window.orderBy(col("v").asc, col("id").asc)).cast("long"))
        .select(col("id"), col("b"))
      assert(got.collect().toSet === want.collect().toSet, s"rows=$rows buckets=$buckets")
    }
  }

  test("liftTable shares sum to 1 and cumulative share is monotone") {
    val df = spark.range(1, 101).select(col("id"), (col("id") % 17 * 10 + 1).cast("double").as("spend"))
    val lift = Ranking.liftTable(df, col("spend"), Seq(col("spend").desc, col("id").asc), 4, "q")
      .orderBy("q").collect()
    assert(lift.length === 4)
    assert(lift.map(_.getLong(1)).sum === 100L)
    val shares = lift.map(_.getDouble(3))
    assert(math.abs(shares.sum - 1.0) < 1e-6)
    val cums = lift.map(_.getDouble(4))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b + 1e-9 })
    assert(math.abs(cums.last - 1.0) < 1e-6)
    // top-quartile-by-spend share must dominate a uniform split
    assert(shares.head > 0.25)
  }

  test("runningAgg matches the single-partition window bit-for-bit across many slices") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1L to 500L).map(i => (i, rnd.nextInt(100).toLong)).toDF("id", "v")
    val w = org.apache.spark.sql.expressions.Window.orderBy("id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val want = rows.withColumn("r", sum(col("v")).over(w))
      .select("id", "r").as[(Long, Long)].collect().toMap
    val got = Ranking.runningAgg(rows, Seq(col("id").asc), col("v"),
        agg = "sum", as = "r", numPartitions = 7)
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert(got == want)
    val wantMax = rows.withColumn("r", max(col("v")).over(w))
      .select("id", "r").as[(Long, Long)].collect().toMap
    val gotMax = Ranking.runningAgg(rows, Seq(col("id").asc), col("v"),
        agg = "max", as = "r", numPartitions = 7)
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert(gotMax == wantMax)
  }

  test("percentRanks is bit-identical to the SQL window functions, ties and all") {
    val df = spark.range(0, 300).select(col("id"),
      (col("id") * 2654435761L % 40).as("v")) // heavy ties: 300 rows, 40 keys
      .repartition(7)
    val got = Ranking.percentRanks(df, col("v"), Seq(col("id").asc))
      .select(col("id"), col("percent_rank"), col("cume_dist"))
    val w = Window.orderBy(col("v").asc)
    val want = df.select(col("id"), percent_rank().over(w).as("percent_rank"),
      cume_dist().over(w).as("cume_dist"))
    assert(got.collect().toSet === want.collect().toSet)
    // single row: SQL says percent_rank 0, cume_dist 1
    val one = Ranking.percentRanks(Seq((1L, 5.0)).toDF("id", "v"), col("v"),
        Seq(col("id").asc))
      .select("percent_rank", "cume_dist").as[(Double, Double)].collect().head
    assert(one == ((0.0, 1.0)))
    intercept[IllegalArgumentException] {
      Ranking.percentRanks(df.withColumn("percent_rank", lit(1)), col("v"),
        Seq(col("id").asc))
    }
  }

  test("runningSums matches per-column window prefixes bit-for-bit, incl. after a shuffle join") {
    // route the input through a shuffle join so upstream row order is
    // nondeterministic — the exact condition under which the nested
    // two-runningAgg composition went wrong
    val base = spark.range(0, 500).select(col("id"),
      (col("id") * 2654435761L % 97).as("x"), (col("id") % 7).cast("double").as("y"))
    val keys = spark.range(0, 500).select(col("id").as("id2")).repartition(13)
    val df = base.join(keys, col("id") === col("id2")).drop("id2")
    val got = Ranking.runningSums(df, Seq(col("id").asc),
        Seq(col("x") -> "cx", col("y") -> "cy"), numPartitions = 5)
      .select(col("id"), col("cx"), col("cy"))
    val w = Window.orderBy(col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = base.select(col("id"), sum(col("x")).over(w).as("cx"),
      sum(col("y")).over(w).as("cy"))
    assert(got.collect().toSet === want.collect().toSet)
    // deterministic across repeated actions (the sampled-boundary bug class)
    assert(got.collect().toSet === want.collect().toSet)
    intercept[IllegalArgumentException] {
      Ranking.runningSums(df, Seq(col("id").asc), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Ranking.runningSums(df, Seq(col("id").asc),
        Seq(col("x") -> "c", col("y") -> "c"))
    }
  }

  test("runningAgg exclusive frame: empty prefix is null (SQL frame semantics)") {
    import spark.implicits._
    val rows = Seq((1L, 10L), (2L, 20L), (3L, 5L)).toDF("id", "v")
    val got = Ranking.runningAgg(rows, Seq(col("id").asc), col("v"),
        agg = "max", as = "r", inclusive = false, numPartitions = 3)
      .select("id", "r").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).isEmpty, "first row has an empty preceding frame")
    assert(got(2L).contains(10L) && got(3L).contains(20L))
  }

  test("skyline2D equals the naive dominance filter, with duplicates and ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val pts = (1 to 400).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong)) ++
      Seq((29L, 29L), (29L, 29L)) // duplicate maximal points both survive
    val df = pts.toDF("x", "y")
    val got = Ranking.skyline2D(df, col("x"), col("y"))
      .select("x", "y").as[(Long, Long)].collect().toSeq.sorted
    val naive = pts.filter { case (px, py) =>
      !pts.exists { case (qx, qy) =>
        qx >= px && qy >= py && (qx > px || qy > py)
      }
    }.sorted
    assert(got == naive)
    assert(got.count(_ == ((29L, 29L))) == 2, "equal maximal points are all kept")
  }

  test("reserved output columns are rejected, not overwritten") {
    val df = spark.range(3).select(col("id"), lit(1).as("r"))
    intercept[IllegalArgumentException] {
      Ranking.globalRank(df, Seq(col("id").asc), "r")
    }
    intercept[IllegalArgumentException] {
      Ranking.ntileExact(df, Seq(col("id").asc), 2, "r")
    }
  }

  test("weightedQuantiles matches the naive CDF definition, ties and all") {
    // values with duplicate entries (weights must merge) and a heavy tail
    val rows = Seq((1.0, 2.0), (1.0, 1.0), (2.0, 3.0), (5.0, 3.0), (9.0, 1.0))
      .toDF("v", "w") // merged CDF: 1→3, 2→6, 5→9, 9→10 of W=10
    val ps = Seq(0.1, 0.3, 0.5, 0.6, 0.9, 1.0)
    val got = Ranking.weightedQuantiles(rows, col("v"), col("w"), ps, "q")
      .as[(Double, Double)].collect().toMap
    val want = Map(0.1 -> 1.0, 0.3 -> 1.0, 0.5 -> 2.0, 0.6 -> 2.0,
      0.9 -> 5.0, 1.0 -> 9.0) // p=1 is the max; cw≥p·W boundaries inclusive
    assert(got == want)
    // unit weights ≡ percentile_disc: smallest v with rank ≥ ceil(p·n)
    val u = spark.range(1, 101).select(col("id").cast("double").as("v"), lit(1.0).as("w"))
    val gu = Ranking.weightedQuantiles(u, col("v"), col("w"), Seq(0.25, 0.5, 0.99), "q")
      .as[(Double, Double)].collect().toMap
    assert(gu == Map(0.25 -> 25.0, 0.5 -> 50.0, 0.99 -> 99.0))
    // nulls and non-positive weights are excluded, not poisonous
    val dirty = Seq((Some(1.0), Some(1.0)), (None, Some(5.0)), (Some(3.0), None),
      (Some(4.0), Some(0.0)), (Some(2.0), Some(-3.0)), (Some(7.0), Some(1.0)))
      .toDF("v", "w")
    val gd = Ranking.weightedQuantiles(dirty, col("v"), col("w"), Seq(0.5, 1.0), "q")
      .as[(Double, Double)].collect().toMap
    assert(gd == Map(0.5 -> 1.0, 1.0 -> 7.0))
    intercept[IllegalArgumentException] {
      Ranking.weightedQuantiles(rows, col("v"), col("w"), Seq(0.0, 0.5))
    }
    intercept[IllegalArgumentException] {
      Ranking.weightedQuantiles(rows, col("v"), col("w"), Seq(0.5, 0.5))
    }
  }

  test("abcClassification: cumulative cuts land exactly, boundaries inclusive") {
    // totals 50/30/15/5 → cum shares .5, .8, .95, 1.0 — the first two
    // are A (≤ .80 inclusive), the third exactly hits the B cut
    val rows = Seq(("w", 20.0), ("w", 30.0), ("x", 30.0), ("y", 15.0), ("z", 5.0))
      .toDF("k", "v").select(col("k"), col("v").cast("decimal(18,2)").as("v"))
    val got = Ranking.abcClassification(rows, col("k"), col("v"))
      .select("key", "abc_class").as[(String, String)].collect().toMap
    assert(got == Map("w" -> "A", "x" -> "A", "y" -> "B", "z" -> "C"))
    // ties in the total break by key: both 10-total keys rank b before c
    val tied = Seq(("a", 80.0), ("b", 10.0), ("c", 10.0)).toDF("k", "v")
      .select(col("k"), col("v").cast("decimal(18,2)").as("v"))
    val t = Ranking.abcClassification(tied, col("k"), col("v"), aCut = 0.85, bCut = 0.92)
      .select("key", "abc_class").as[(String, String)].collect().toMap
    assert(t == Map("a" -> "A", "b" -> "B", "c" -> "C"))
    intercept[IllegalArgumentException] {
      Ranking.abcClassification(rows, col("k"), col("v"), aCut = 0.9, bCut = 0.8)
    }
  }
}
