package graft.expressions

import graft.SparkSpec
import graft.vectors.{Pq, VectorOps}
import org.apache.spark.sql.functions._

/** Pins the round-13 native PQ expressions bit-for-bit against the
  * higher-order-function formulation they replaced (the exactness
  * contract DuckDB-oracle parity rides on): same per-subspace fold
  * order, same first-min tie rule, same global dim-order accumulation
  * for ADC / reconstruction error. */
class PqExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val cloud = (0 until 240).map { i =>
    (i.toLong, (0 until 16).map { d =>
      ((i % 5) * 1.7 + 0.31 * math.sin(i * 0.917 + d * 1.3)).toFloat
    })
  }
  private lazy val df = cloud.toDF("id", "vec")
  private lazy val model = Pq.train(df, "id", "vec", dim = 16, m = 4, kCodes = 5, rounds = 2)

  // the ORIGINAL HOF encode, kept verbatim as the semantic reference
  private def hofEncode(vec: org.apache.spark.sql.Column) = {
    val v = VectorOps.toDouble(vec)
    val cb = typedLit(model.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    transform(sequence(lit(0), lit(model.m - 1)), j => {
      val sub = slice(v, j * lit(model.subDim) + 1, lit(model.subDim))
      val dists = transform(element_at(cb, j + 1), c =>
        aggregate(zip_with(c, sub, (a, b) => (a - b) * (a - b)), lit(0.0), _ + _))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    })
  }

  test("native encode equals the HOF formulation on every row") {
    val rows = df
      .select(model.encode(col("vec")).as("n"), hofEncode(col("vec")).as("h"))
      .as[(Seq[Int], Seq[Int])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, h) => assert(n == h, s"$n vs $h") }
  }

  test("native adcL2 is bit-identical to the flat decode+fold") {
    val v = VectorOps.toDouble(col("vec"))
    val rows = df
      .withColumn("codes", model.encode(col("vec")))
      .select(model.adcL2(v, col("codes")).as("n"),
        aggregate(zip_with(v, model.decode(col("codes")),
          (a, b) => (a - b) * (a - b)), lit(0.0), _ + _).as("h"))
      .as[(Double, Double)].collect()
    rows.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(h),
        s"$n vs $h") }
  }

  test("native quantErr is bit-identical to decode(encode(v)) + fold") {
    val v = VectorOps.toDouble(col("vec"))
    val rows = df
      .select(model.quantErr(col("vec")).as("n"),
        aggregate(zip_with(v, model.decode(model.encode(col("vec"))),
          (a, b) => (a - b) * (a - b)), lit(0.0), _ + _).as("h"))
      .as[(Double, Double)].collect()
    rows.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(h),
        s"$n vs $h") }
  }

  test("refine(train(0), r) equals train(r)") {
    val direct = Pq.train(df, "id", "vec", dim = 16, m = 4, kCodes = 5, rounds = 2)
    val contin = Pq.refine(df, "vec",
      Pq.train(df, "id", "vec", dim = 16, m = 4, kCodes = 5, rounds = 0), rounds = 2)
    assert(direct.codebooks.flatten.flatten.toSeq == contin.codebooks.flatten.flatten.toSeq)
  }

  test("null and length-mismatch inputs yield null, not errors") {
    val bad = Seq((1L, Some((0 until 8).map(_.toDouble))), (2L, None))
      .toDF("id", "v")
    val out = bad.select(
      graft.expressions.PqExpressions.pqEncode(col("v").cast("array<double>"),
        model.m, model.kCodes, model.subDim,
        Array.fill(model.m * model.kCodes * model.subDim)(0.0)).as("c"))
      .collect()
    assert(out.forall(_.isNullAt(0)))
  }
}
