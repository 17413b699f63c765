package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BasketSpec extends SparkSpec {
  import spark.implicits._

  // baskets: {x,y} {x,y} {x,z} {y} → N=4, n_x=3, n_y=3, n_z=1, n_xy=2
  private val rows = Seq(
    (1L, "x"), (1L, "y"),
    (2L, "x"), (2L, "y"), (2L, "y"), // repeat item collapses
    (3L, "x"), (3L, "z"),
    (4L, "y")).toDF("b", "i")

  test("support, confidences, and lift by hand") {
    val out = Basket.coOccurrence(rows, col("b"), col("i"), minSupport = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val xy = out(("x", "y"))
    assert(xy.getAs[Long]("n_joint") == 2, "repeat purchase must not inflate the joint")
    assert(math.abs(xy.getAs[Double]("support") - 0.5) < 1e-12)
    assert(math.abs(xy.getAs[Double]("conf_a_to_b") - 2.0 / 3) < 1e-12)
    assert(math.abs(xy.getAs[Double]("conf_b_to_a") - 2.0 / 3) < 1e-12)
    // lift = N*n_xy/(n_x*n_y) = 4*2/9
    assert(math.abs(xy.getAs[Double]("lift") - 8.0 / 9) < 1e-12)
    val xz = out(("x", "z"))
    assert(math.abs(xz.getAs[Double]("lift") - 4.0 / 3) < 1e-12, "rare-but-together lifts above 1")
    assert(!out.contains(("y", "z")), "never co-occurred")
  }

  test("minSupport floors the pair table") {
    val out = Basket.coOccurrence(rows, col("b"), col("i"), minSupport = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("x", "y")))
  }

  test("mega-baskets are dropped before pairing, and drop out of the marginals") {
    val mega = (1 to 50).map(i => (9L, s"m$i"))
    val out = Basket.coOccurrence(rows.unionAll(mega.toDF("b", "i")),
        col("b"), col("i"), minSupport = 1, maxBasketSize = 10)
      .collect()
    assert(!out.exists(r => r.getString(0).startsWith("m")), "capped basket generates no pairs")
    val xy = out.find(r => r.getString(0) == "x" && r.getString(1) == "y").get
    assert(math.abs(xy.getAs[Double]("support") - 0.5) < 1e-12,
      "N counts only surviving baskets")
  }
}
