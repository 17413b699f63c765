package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private lazy val t = Seq(
    (1L, Some("a"), Some(10.0), "O"),
    (2L, Some("b"), Some(20.0), "F"),
    (3L, None, Some(-5.0), "O"),
    (4L, Some("a"), None, "X"),
    (4L, Some("c"), Some(999.0), "O")) // duplicate id
    .toDF("id", "name", "price", "status")

  test("audit computes every metric exactly in one pass") {
    val out = Checks.audit(t, Seq(
      Checks.RowCountBetween(1, 100),
      Checks.NotNull("name", maxNullFrac = 0.0),
      Checks.Unique("id"),
      Checks.InRange("price", 0, 100, maxViolFrac = 0.0),
      Checks.InSet("status", Seq("O", "F")),
      Checks.MatchesRegex("name", "[ab]", minMatchFrac = 0.5)))
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getBoolean(4))).toMap
    assert(out("row_count_between(1,100)") == ((5.0, true)))
    assert(out("not_null(name)") == ((0.2, false)))          // 1/5 null
    assert(out("unique(id)") == ((0.2, false)))              // 4 distinct / 5
    assert(out("in_range(price)") == ((0.5, false)))         // -5, 999 of 4 non-null
    assert(out("in_set(status)") == ((0.2, false)))          // X of 5
    assert(out("matches_regex(name)") == ((0.75, true)))     // a,b,a of 4 non-null
  }

  test("audit is a single scan over the input") {
    val dir = java.nio.file.Files.createTempDirectory("checks").toString
    t.write.mode("overwrite").parquet(dir)
    val plan = Checks.audit(spark.read.parquet(dir), Seq(
        Checks.NotNull("name"), Checks.InRange("price", 0, 100), Checks.RowCountBetween(1, 10)))
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 scan, got $scans in:\n$plan")
  }

  test("ApproxUnique stays within its error bound") {
    val big = spark.range(10000).toDF("id")
    val m = Checks.audit(big, Seq(Checks.ApproxUnique("id", maxDupFrac = 0.05)))
      .select("metric").as[Double].head()
    assert(math.abs(m) < 0.05, s"approx dup fraction $m out of bound")
  }

  test("empty-table conformity checks pass, not NaN") {
    val out = Checks.audit(t.filter(lit(false)), Seq(
      Checks.InRange("price", 0, 100), Checks.InSet("status", Seq("O")),
      Checks.NotNull("name")))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out.values.forall(v => !v.isNaN))
    assert(out("in_range(price)") == 0.0)
  }
}
