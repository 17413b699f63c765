package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def exactCounts(values: Seq[String]): Map[String, Long] =
    values.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("estimates never undercount and stay inside the eps*N envelope") {
    val values = (1 to 200).flatMap(i => Seq.fill(i % 7 + 1)(s"item-${i % 40}"))
    val bytes = CountMin.build(values.toDF("v"), col("v"))
    val exact = exactCounts(values)
    val n = CountMin.totalCount(bytes)
    assert(n == values.size.toLong, "totalCount must equal insertions")
    val slack = math.ceil(math.E / CountMin.DefaultWidth * n).toLong
    val est = exact.keys.toSeq.toDF("v")
      .select(col("v"), CountMin.estimate(bytes, col("v")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (v, c) =>
      assert(est(v) >= c, s"$v undercounted: ${est(v)} < $c — CM must never undercount")
      assert(est(v) <= c + slack, s"$v overcounted past the envelope: ${est(v)} > $c + $slack")
    }
  }

  test("per-slice sketches merge to exactly the whole-corpus sketch") {
    val a = (1 to 300).map(i => s"k-${i % 20}")
    val b = (1 to 200).map(i => s"k-${i % 30}")
    val whole = CountMin.build((a ++ b).toDF("v"), col("v"))
    val sa = CountMin.build(a.toDF("v"), col("v"))
    val sb = CountMin.build(b.toDF("v"), col("v"))
    val merged = Seq(sa, sb).toDF("cm")
      .agg(CountMin.cmUnionAgg(col("cm")).as("cm")).head().getAs[Array[Byte]](0)
    // counter addition is exact: merged state is bit-identical to the
    // single-pass sketch, not merely estimate-close
    assert(java.util.Arrays.equals(merged, whole),
      "slice-merge must equal the one-pass sketch byte-for-byte")
  }

  test("long inputs hash natively and nulls are skipped") {
    val df = Seq(Some(1L), Some(1L), Some(2L), None).toDF("v")
    val bytes = df.agg(CountMin.cmAgg(col("v")).as("cm")).head().getAs[Array[Byte]](0)
    assert(CountMin.totalCount(bytes) == 3L, "nulls must not count as insertions")
    val est = Seq(1L, 2L, 3L).toDF("v")
      .select(CountMin.estimate(bytes, col("v"))).as[Long].collect()
    assert(est(0) >= 2L && est(1) >= 1L)
  }

  // the SQL surface (graft_cm_agg / graft_cm_union_agg) is exercised in
  // graft.plans.SqlFunctionsSpec's isolated extension session — never
  // registered into the shared test session (it must stay unpolluted)
}
