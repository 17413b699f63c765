package graft.analytics

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class PrecedenceSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("precedencePairs equals the brute-force definition, strict on ties") {
    // basket 1: a@1, b@2, a@3  → a<b (1<2), b<a (2<3)
    // basket 2: a@1, b@1      → ties only; NO pair either way (strict <)
    // basket 3: b@1, a@2, c@3 → b<a, b<c, a<c
    val rows = Seq(
      (1L, "a", t("2024-01-01 00:00:01")), (1L, "b", t("2024-01-01 00:00:02")),
      (1L, "a", t("2024-01-01 00:00:03")),
      (2L, "a", t("2024-01-02 00:00:01")), (2L, "b", t("2024-01-02 00:00:01")),
      (3L, "b", t("2024-01-03 00:00:01")), (3L, "a", t("2024-01-03 00:00:02")),
      (3L, "c", t("2024-01-03 00:00:03"))).toDF("bk", "et", "ts")
    val got = Precedence.precedencePairs(rows, col("bk"), col("et"), col("ts"))
      .select("a", "b", "support", "share")
      .as[(String, String, Long, Double)].collect()
      .map { case (a, b, n, sh) => ((a, b), (n, sh)) }.toMap
    // brute force over the same rows
    val data = rows.as[(Long, String, Timestamp)].collect()
    val baskets = data.map(_._1).distinct
    val expected = (for {
      (bk, a, ta) <- data; (bk2, b, tb) <- data
      if bk == bk2 && a != b && ta.before(tb)
    } yield (bk, a, b)).distinct.groupBy { case (_, a, b) => (a, b) }
      .map { case (k, v) => k -> ((v.length.toLong,
        BigDecimal(v.length.toDouble / baskets.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)) }
    assert(got == expected)
    assert(got(("a", "b"))._1 == 1L) // basket 1 only (basket 3's a follows its b)
    assert(got(("b", "a"))._1 == 2L) // baskets 1 (b@2 < a@3) and 3
    assert(!got.keySet.exists { case (a, b) => a == b }, "no self-pairs")
  }

  test("precedencePairs: minSupport filters, nulls excluded") {
    val rows = Seq(
      (Some(1L), Some("a"), Some(t("2024-01-01 00:00:01"))),
      (Some(1L), Some("b"), Some(t("2024-01-01 00:00:02"))),
      (Some(2L), Some("a"), Some(t("2024-01-02 00:00:01"))),
      (Some(2L), Some("b"), Some(t("2024-01-02 00:00:02"))),
      (None, Some("a"), Some(t("2024-01-03 00:00:01"))), // null basket: out
      (Some(3L), None, Some(t("2024-01-03 00:00:01"))),  // null type: out
      (Some(3L), Some("z"), None))                        // null ts: out
      .toDF("bk", "et", "ts")
    val got = Precedence.precedencePairs(rows, col("bk"), col("et"), col("ts"),
        minSupport = 2L)
      .select("a", "b", "support").as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", 2L)))
    intercept[IllegalArgumentException] {
      Precedence.precedencePairs(rows, col("bk"), col("et"), col("ts"), minSupport = 0)
    }
  }
}
