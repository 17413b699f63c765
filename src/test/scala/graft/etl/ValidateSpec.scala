package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ValidateSpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq(
    Validate.Rule("missing_id", col("id").isNotNull),
    Validate.Rule("bad_score", col("score") > 0))

  test("withRejectReason names the FIRST failing rule") {
    val df = Seq((Some(1L), 5.0), (None, 5.0), (None, -1.0), (Some(2L), -1.0))
      .toDF("id", "score")
    val out = Validate.withRejectReason(df, rules)
      .select("reject_reason").collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(None, Some("missing_id"), Some("missing_id"), Some("bad_score")))
  }

  test("valid/rejected partition the input") {
    val df = Seq((Some(1L), 5.0), (None, 5.0)).toDF("id", "score")
    assert(Validate.valid(df, rules).count() == 1)
    assert(Validate.rejected(df, rules).count() == 1)
    assert(Validate.valid(df, rules).columns.toSeq == df.columns.toSeq)
  }

  test("null rule result counts as failure (API-error style rows)") {
    val df = Seq((Some(1L), null.asInstanceOf[java.lang.Double])).toDF("id", "score")
    assert(Validate.rejected(df, rules).select("reject_reason").as[String].head() == "bad_score")
  }

  test("SchemaCheck.diff reports missing, type-mismatch, extra") {
    val expected = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType)))
    val actual = StructType(Seq(
      StructField("a", IntegerType), StructField("c", StringType)))
    val problems = SchemaCheck.diff(actual, expected).map(m => (m.field, m.problem.split(" ").head)).toSet
    assert(problems == Set(("a", "type"), ("b", "missing"), ("c", "unexpected")))
    assert(!SchemaCheck.conforms(actual, expected))
    assert(SchemaCheck.conforms(expected, expected))
  }
}
