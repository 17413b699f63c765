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

  test("reserved output columns are rejected, not overwritten") {
    val df = spark.range(3).select(col("id"), lit(1).as("r"))
    intercept[IllegalArgumentException] {
      Ranking.globalRank(df, Seq(col("id").asc), "r")
    }
    intercept[IllegalArgumentException] {
      Ranking.ntileExact(df, Seq(col("id").asc), 2, "r")
    }
  }
}
