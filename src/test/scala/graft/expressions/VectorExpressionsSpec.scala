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

  test("hyperplaneSigsNative packs sign bits matching a scala-side recompute") {
    val tables = 3; val bits = 5; val dims = 8
    val vecs = (0 until 50).map(i => Tuple1(Array.tabulate(dims)(d => ((i * 13 + d * 5) % 17 - 8) / 8.0)))
    val got = vecs.toDF("v")
      .select(VectorExpressions.hyperplaneSigsNative(col("v"), tables, bits, dims).as("s"))
      .as[Seq[Long]].collect()
    vecs.map(_._1).zip(got).foreach { case (v, sigs) =>
      val expected = (0 until tables).map { t =>
        (0 until bits).map { p =>
          val dot = (0 until dims).map(d => v(d) * VectorExpressions.planeCoef(t, p, d)).sum
          if (dot > 0) 1L << p else 0L
        }.reduce(_ | _)
      }
      assert(sigs == expected, s"vector ${v.toSeq}")
    }
  }

  test("hyperplaneSigsNative: null vector, wrong dims, or null element yields null") {
    val df = Seq(
      Some(Seq(Some(1.0), Some(2.0), Some(3.0))),
      Some(Seq(Some(1.0), Some(2.0))),             // wrong dims
      Some(Seq(Some(1.0), None, Some(3.0))),       // null element
      Option.empty[Seq[Option[Double]]]
    ).toDF("v")
    val out = df.select(
      VectorExpressions.hyperplaneSigsNative(col("v"), tables = 1, bits = 2, dims = 3).as("s"))
      .collect()
    assert(!out(0).isNullAt(0))
    assert(out(1).isNullAt(0) && out(2).isNullAt(0) && out(3).isNullAt(0))
  }

  test("hyperplaneSigsNative interpreted eval matches codegen output") {
    val lit = org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1.0, 2.0, 3.0),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
    val e = HyperplaneSigs(lit, tables = 2, bits = 3, dims = 3)
    val interp = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray.toSeq
    val viaDf = Seq(Tuple1(Array(1.0, 2.0, 3.0))).toDF("v")
      .select(VectorExpressions.hyperplaneSigsNative(col("v"), 2, 3, 3).as("s"))
      .as[Seq[Long]].head()
    assert(interp == viaDf)
    val expected = (0 until 2).map { t =>
      (0 until 3).map { p =>
        val dot = (0 until 3).map(d => Array(1.0, 2.0, 3.0)(d) * VectorExpressions.planeCoef(t, p, d)).sum
        if (dot > 0) 1L << p else 0L
      }.reduce(_ | _)
    }
    assert(interp == expected)
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
