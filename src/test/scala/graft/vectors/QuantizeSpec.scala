package graft.vectors

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Seq(0.5, -1.0, 0.25, 0.0)),
    (2L, Seq(0.01, 0.02, -0.005, 0.0125)),
    (3L, Seq(0.0, 0.0, 0.0, 0.0)), // zero vector
    (4L, Seq(127.0, -127.0, 63.5, 1.0)))
    .toDF("id", "v")

  private lazy val quantized = vecs
    .withColumn("scale", Quantize.int8Scale(col("v")))
    .withColumn("q", Quantize.int8Quantize(col("v"), col("scale")))

  test("quantization round-trips within scale/2 per dimension, zero vectors to zeros") {
    val rows = quantized
      .withColumn("err", Quantize.int8MaxError(col("v"), col("q"), col("scale")))
      .select("id", "scale", "q", "err")
      .as[(Long, Double, Seq[Int], Double)].collect().map(r => r._1 -> r).toMap
    rows.values.foreach { case (id, scale, q, err) =>
      assert(q.forall(x => x >= -127 && x <= 127), s"id $id out of range: $q")
      if (scale > 0) assert(err <= scale / 2 + 1e-12, s"id $id err $err > scale/2 ${scale / 2}")
    }
    assert(rows(3L)._3 == Seq(0, 0, 0, 0)) // zero vector: scale 0, all-zero code
    assert(rows(3L)._4 == 0.0)
    // the max-|v| dimension quantizes to exactly ±127 (symmetric scaling)
    assert(rows(1L)._3(1) == -127)
  }

  test("quantized dot approximates the exact dot within the error bound") {
    val pairs = quantized.as("a").crossJoin(quantized.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(
        VectorOps.dot(col("a.v"), col("b.v")).as("exact"),
        Quantize.int8Dot(col("a.q"), col("a.scale"), col("b.q"), col("b.scale")).as("approx"),
        col("a.scale").as("sa"), col("b.scale").as("sb"),
        size(col("a.v")).as("d"),
        sqrt(VectorOps.dot(col("a.v"), col("a.v"))).as("na"),
        sqrt(VectorOps.dot(col("b.v"), col("b.v"))).as("nb"))
      .collect()
    pairs.foreach { r =>
      val (exact, approx) = (r.getDouble(0), r.getDouble(1))
      val (sa, sb, d) = (r.getDouble(2), r.getDouble(3), r.getInt(4))
      val (na, nb) = (r.getDouble(5), r.getDouble(6))
      // |Σab − Σ(a+ea)(b+eb)| ≤ d·(‖a‖∞·sb/2 + ‖b‖∞·sa/2 + sa·sb/4) ≤ loose bound below
      val bound = d * (nb * sa / 2 + na * sb / 2 + sa * sb / 4) + 1e-12
      assert(math.abs(exact - approx) <= bound, s"exact $exact approx $approx bound $bound")
    }
  }

  test("quantization is a narrow map: no shuffle in the plan") {
    val plan = quantized.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"quantization must not shuffle:\n$plan")
  }
}
