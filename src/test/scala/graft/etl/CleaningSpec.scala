package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CleaningSpec extends SparkSpec {
  import spark.implicits._

  test("nullifyNonPositive nulls <= 0, keeps positives") {
    val df = Seq(1.0, 0.0, -3.0, 2.5).toDF("x")
    val out = Cleaning.nullifyNonPositive(df, Seq("x")).collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(Some(1.0), None, None, Some(2.5)))
  }

  test("conditionalNull nulls target only where cond holds") {
    val df = Seq((5.0, 0L), (7.0, 3L)).toDF("rating", "votes")
    val out = Cleaning.conditionalNull(df, "rating", col("votes") === 0)
      .orderBy("votes").collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(None, Some(7.0)))
  }

  test("placeholderToNull maps placeholders, keeps real values") {
    val df = Seq("No Data", "real", "N/A").toDF("t")
    val out = Cleaning.placeholderToNull(df, "t", Seq("No Data", "N/A"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.count(_.isEmpty) == 2 && out.contains(Some("real")))
  }

  test("dedupKeepFirst is deterministic: min order key survives per group") {
    val df = Seq((1L, 2, "b"), (1L, 1, "a"), (2L, 9, "z")).toDF("id", "seq", "v")
    val out = Cleaning.dedupKeepFirst(df, Seq(col("id")), Seq(col("seq")))
      .orderBy("id").collect()
    assert(out.map(_.getString(2)).toSeq == Seq("a", "z"))
  }

  test("minNonNull keeps rows with >= k non-nulls") {
    val df = Seq((Some(1), Some(2)), (Some(1), None), (None, None))
      .toDF("a", "b")
    assert(Cleaning.minNonNull(df, Seq("a", "b"), 1).count() == 2)
    assert(Cleaning.minNonNull(df, Seq("a", "b"), 2).count() == 1)
  }

  test("castColumns + project produce the target schema in order") {
    val df = Seq(("1", 2.0)).toDF("a", "b")
    val cast = Cleaning.castColumns(df, Map("a" -> "long"))
    val out = Cleaning.project(cast, Seq("b" -> col("b"), "a2" -> col("a")))
    assert(out.columns.toSeq == Seq("b", "a2"))
    assert(out.schema("a2").dataType.typeName == "long")
  }

  test("winsorizeByGroup clips into per-group percentile bounds, keeps rows") {
    // group g: values 1..10 → p10 = 1.9, p90 = 9.1 (linear interpolation)
    val df = ((1 to 10).map(v => ("g", v.toDouble)) :+ (("h", 1000.0)))
      .toDF("grp", "x")
    val out = Cleaning.winsorizeByGroup(df, col("grp"), "x", lo = 0.1, hi = 0.9)
    assert(out.count() == 11) // nothing dropped
    val g = out.filter(col("grp") === "g").select("x", "x_w")
      .as[(Double, Double)].collect().toMap
    assert(g(1.0) == 1.9 && g(10.0) == 9.1) // tails clipped
    assert(g(5.0) == 5.0)                    // middle untouched
    // a single-row group clips to itself
    val h = out.filter(col("grp") === "h").select("x_w").as[Double].head()
    assert(h == 1000.0)
  }
}
