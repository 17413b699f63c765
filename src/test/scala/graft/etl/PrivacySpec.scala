package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // (zip, age_band, diagnosis)
  private val rows = Seq(
    ("10001", "20-29", "flu"), ("10001", "20-29", "flu"), ("10001", "20-29", "cold"),
    ("10002", "30-39", "flu"), ("10002", "30-39", "flu"),
    ("10003", "40-49", "cancer")) // singleton group — uniquely identifying
  private def df = rows.toDF("zip", "age", "dx")

  test("kAnonymityAudit counts risky groups and rows below k") {
    val out = Privacy.kAnonymityAudit(df, Seq(col("zip"), col("age")), k = 3).collect().head
    assert(out.getAs[Int]("k") == 3)
    assert(out.getAs[Long]("n_rows") == 6 && out.getAs[Long]("n_groups") == 3)
    assert(out.getAs[Long]("min_group_size") == 1)
    assert(out.getAs[Long]("n_risky_groups") == 2, "the pair and the singleton")
    assert(out.getAs[Long]("n_rows_at_risk") == 3)
    assert(math.abs(out.getAs[Double]("risk_share") - 0.5) < 1e-12)
    assert(out.isNullAt(out.fieldIndex("min_l_diversity")), "no sensitive column given")
  }

  test("l-diversity exposes a k-anonymous group with a single sensitive value") {
    // group 10002 has size 2 (k-anonymous at k=2) but every member has
    // the same diagnosis — the attribute leaks even though the row set
    // is anonymous.
    val out = Privacy.kAnonymityAudit(df, Seq(col("zip"), col("age")), k = 2,
      sensitive = Some(col("dx"))).collect().head
    assert(out.getAs[Long]("min_l_diversity") == 1)
  }

  test("riskyGroups returns the offending combinations, most identifying first") {
    val out = Privacy.riskyGroups(df, Seq(col("zip"), col("age")), k = 3)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(out.toSeq == Seq(("10003", 1L), ("10002", 2L)))
  }

  test("annotateKAnonymity flags rows and is null-safe on quasi values") {
    val withNulls = (rows :+ ((null: String), "20-29", "flu") :+ ((null: String), "20-29", "flu"))
      .toDF("zip", "age", "dx")
    val out = Privacy.annotateKAnonymity(withNulls, Seq(col("zip"), col("age")), k = 2)
    assert(out.count() == 8, "annotation preserves row count")
    val nullGroup = out.filter(col("zip").isNull).select("group_size", "at_risk")
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    assert(nullGroup.forall(_ == ((2L, false))), "null zips group TOGETHER (GROUP BY semantics)")
    assert(out.filter(col("zip") === "10003").collect().head.getAs[Boolean]("at_risk"))
    assert(out.filter(col("at_risk")).count() == 1)
  }
}
