package graft.plans

import graft.SparkSpec
import graft.expressions.DotProduct
import graft.vectors.VectorOps
import org.apache.spark.sql.functions._

class RewriteDotProductSpec extends SparkSpec {
  import spark.implicits._

  // parquet-backed (a local Seq would constant-fold into a LocalRelation
  // before user-provided optimizer rules ever see the expression)
  private lazy val df = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    .limit(50)
    .select(VectorOps.toDouble(col("embedding")).as("a"),
      reverse(VectorOps.toDouble(col("embedding"))).as("b"))

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations = Seq(RewriteDotProduct)
    try f finally spark.experimental.extraOptimizations = Nil
  }

  private def containsDot(q: org.apache.spark.sql.DataFrame): Boolean =
    q.queryExecution.optimizedPlan.collectFirst {
      case p if p.expressions.exists(_.exists {
        case _: DotProduct => true
        case _ => false
      }) => true
    }.isDefined

  test("the HOF aggregate(zip_with(·×·)) pattern is rewritten to graft_dot") {
    withRule {
      val q = df.select(VectorOps.dot(col("a"), col("b")).as("d"))
      assert(containsDot(q), "optimizer did not substitute DotProduct")
      assert(q.as[Double].collect().length == 50)
    }
  }

  test("unrelated aggregate folds are left alone") {
    withRule {
      // a plain fold (no zip_with) — not the dot-product pattern
      val q = df.select(
        aggregate(col("a"), lit(0.0), (acc, x) => acc + x * x).as("s"))
      assert(!containsDot(q))
      assert(q.as[Double].collect().length == 50)
    }
  }

  test("results are identical with and without the rule") {
    val plain = df.select(VectorOps.dot(col("a"), col("b"))).as[Double].collect().toSeq
    val ruled = withRule(df.select(VectorOps.dot(col("a"), col("b"))).as[Double].collect().toSeq)
    assert(plain == ruled)
  }
}
