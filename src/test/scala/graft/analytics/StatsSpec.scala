package graft.analytics

import graft.{PlanShapes, SparkSpec}
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("correlationMatrix: exact values on hand-computable data") {
    // y = 2x (corr 1), z = -x (corr -1); cov_samp(x, 2x) = 2*var_samp(x)
    val df = Seq((1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0), (4.0, 8.0, -4.0))
      .toDF("x", "y", "z").withColumn("g", lit("a"))
    val r = Stats.correlationMatrix(df, Seq(col("g")), Seq("x", "y", "z")).head()
    assert(r.getAs[Long]("n") === 4L)
    assert(math.abs(r.getAs[Double]("corr_x_y") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("corr_x_z") + 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("corr_y_z") + 1.0) < 1e-12)
    val varX = Seq(1.0, 2.0, 3.0, 4.0).map(v => (v - 2.5) * (v - 2.5)).sum / 3
    assert(math.abs(r.getAs[Double]("cov_x_y") - 2 * varX) < 1e-12)
  }

  test("groups are independent; constant columns yield null corr") {
    val df = Seq(("a", 1.0, 5.0), ("a", 2.0, 5.0), ("b", 1.0, 1.0), ("b", 2.0, 2.0))
      .toDF("g", "x", "y")
    val rows = Stats.correlationMatrix(df, Seq(col("g")), Seq("x", "y"))
      .orderBy("g").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("corr_x_y"))) // zero variance in y
    assert(math.abs(rows(1).getAs[Double]("corr_x_y") - 1.0) < 1e-12)
  }

  test("all pairs ride ONE aggregate: single shuffle, no extra scans") {
    val df = spark.range(100).select(
      (col("id") % 7).as("g"), col("id").cast("double").as("a"),
      (col("id") * 2).cast("double").as("b"), (col("id") % 13).cast("double").as("c"))
    val shape = PlanShapes.executedShape(
      Stats.correlationMatrix(df, Seq(col("g")), Seq("a", "b", "c")))
    assert(shape.shuffles === 1, s"expected one group-key shuffle, got $shape")
  }

  test("gini: perfect equality 0, single holder (n-1)/n, hand value, tie-invariance") {
    import spark.implicits._
    def g(vals: Seq[Double]): Double =
      Stats.gini(vals.zipWithIndex.map { case (v, i) => (v, i.toLong) }.toDF("v", "id"),
        col("v"), Seq(col("id"))).collect().head.getAs[Double]("gini")
    assert(math.abs(g(Seq(5.0, 5.0, 5.0, 5.0))) < 1e-12)
    assert(math.abs(g(Seq(0.0, 0.0, 0.0, 8.0)) - 0.75) < 1e-12)
    assert(math.abs(g(Seq(1.0, 2.0, 3.0, 4.0)) - 0.25) < 1e-12)
    // tied values: rank assignment among ties cannot move the statistic
    assert(math.abs(g(Seq(2.0, 2.0, 6.0)) - g(Seq(2.0, 6.0, 2.0))) < 1e-12)
  }

  test("gini rejects negative values loudly") {
    import spark.implicits._
    val df = Seq((1.0, 1L), (-2.0, 2L)).toDF("v", "id")
    intercept[Exception] {
      Stats.gini(df, col("v"), Seq(col("id"))).collect()
    }
  }
}
