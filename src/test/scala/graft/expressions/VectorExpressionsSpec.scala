package graft.expressions

import graft.SparkSpec
import graft.vectors.VectorOps
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("dotNative matches the fold formulation bit-for-bit") {
    val df = (0 until 200).map { i =>
      (Array.tabulate(64)(d => ((i * 31 + d * 7) % 13 - 6) / 6.0f),
       Array.tabulate(64)(d => ((i * 17 + d * 3) % 11 - 5) / 5.0f))
    }.toDF("a", "b")
      .select(VectorOps.toDouble(col("a")).as("a"), VectorOps.toDouble(col("b")).as("b"))
    val mismatches = df.select(
        (VectorExpressions.dotNative(col("a"), col("b")) - VectorOps.dot(col("a"), col("b"))).as("d"))
      .filter(col("d") =!= 0.0).count()
    assert(mismatches == 0)
  }

  test("dotNative: null array or length mismatch yields null (HOF parity)") {
    val df = Seq(
      (Some(Array(1.0, 2.0, 3.0)), Some(Array(2.0, 3.0))), // ragged → null, like zip_with padding
      (None, Some(Array(1.0))),
      (Some(Array(2.0, 5.0)), Some(Array(3.0, 4.0)))
    ).toDF("a", "b")
    val out = df.select(VectorExpressions.dotNative(col("a"), col("b")).as("d")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0) == 26.0)
  }

  test("dotNative rejects non-double arrays at analysis time") {
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b") // array<float>
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(VectorExpressions.dotNative(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("graft_dot") || e.getMessage.toLowerCase.contains("data type"))
  }

  test("dotNative survives both codegen and interpreted evaluation") {
    // force the interpreted path via eval() on the expression itself
    val e = DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1.0, 2.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(3.0, 4.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    assert(e.eval(null) == 11.0)
  }
}
