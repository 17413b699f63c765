package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpec {
  import spark.implicits._

  // change log: user 1 goes A,A,B,A (the repeat must collapse);
  // user 2 never changes
  private lazy val log = Seq(
    (1L, 10L, "A"), (1L, 20L, "A"), (1L, 30L, "B"), (1L, 40L, "A"),
    (2L, 15L, "X"), (2L, 25L, "X"))
    .toDF("uid", "ts", "state")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("uid", "valid_from")
      .select("uid", "state", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq

  test("fromChangeLog collapses consecutive-duplicate states into intervals") {
    val dim = Scd.fromChangeLog(log, Seq("uid"), Seq("state"), "ts")
    assert(rows(dim) == Seq(
      (1L, "A", 10L, Some(30L), false),
      (1L, "B", 30L, Some(40L), false),
      (1L, "A", 40L, None, true),
      (2L, "X", 15L, None, true)))
  }

  test("fromChangeLog plans ONE exchange for both windows") {
    val plan = Scd.fromChangeLog(log, Seq("uid"), Seq("state"), "ts")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges in:\n$plan")
  }

  test("fromChangeLog breaks same-timestamp ties deterministically") {
    val tied = Seq((1L, 10L, 1L, "A"), (1L, 10L, 2L, "B"), (1L, 20L, 3L, "C"))
      .toDF("uid", "ts", "seq", "state")
    val dim = Scd.fromChangeLog(tied, Seq("uid"), Seq("state"), "ts", tieBreak = Seq("seq"))
      .orderBy("valid_from", "state")
      .select("state", "valid_from", "valid_to")
      .as[(String, Long, Option[Long])].collect().toSeq
    // A at ts=10 (zero-length interval), B at ts=10, C open
    assert(dim == Seq(("A", 10L, Some(10L)), ("B", 10L, Some(20L)), ("C", 20L, None)))
  }

  test("applyUpdates: no-op and new-state batches; untouched keys pass through") {
    val dim = Scd.fromChangeLog(log, Seq("uid"), Seq("state"), "ts")
    // user 1: observation equal to current state (no-op) then a real change;
    // user 2 untouched
    val batch = Seq((1L, 50L, "A"), (1L, 60L, "C")).toDF("uid", "ts", "state")
    val merged = Scd.applyUpdates(dim, batch, Seq("uid"), Seq("state"), "ts")
    assert(rows(merged) == Seq(
      (1L, "A", 10L, Some(30L), false),
      (1L, "B", 30L, Some(40L), false),
      (1L, "A", 40L, Some(60L), false), // no-op at 50 absorbed, closed at 60
      (1L, "C", 60L, None, true),
      (2L, "X", 15L, None, true)))
  }

  test("applyUpdates interleaves a late-arriving observation into history") {
    val dim = Scd.fromChangeLog(log, Seq("uid"), Seq("state"), "ts")
    val late = Seq((1L, 35L, "D")).toDF("uid", "ts", "state") // between B@30 and A@40
    val merged = Scd.applyUpdates(dim, late, Seq("uid"), Seq("state"), "ts")
    assert(rows(merged).filter(_._1 == 1L) == Seq(
      (1L, "A", 10L, Some(30L), false),
      (1L, "B", 30L, Some(35L), false),
      (1L, "D", 35L, Some(40L), false),
      (1L, "A", 40L, None, true)))
  }

  test("fromChangeLog is null-safe on attribute states") {
    val withNulls = Seq((1L, 10L, Some("A")), (1L, 20L, None), (1L, 30L, None), (1L, 40L, Some("A")))
      .toDF("uid", "ts", "state")
    val dim = Scd.fromChangeLog(withNulls, Seq("uid"), Seq("state"), "ts")
      .select("valid_from").as[Long].collect().toSeq.sorted
    assert(dim == Seq(10L, 20L, 40L)) // the two nulls collapse into one interval
  }

  test("fromChangeLog rejects reserved names in key/attr/tie-break roles") {
    intercept[IllegalArgumentException] {
      Scd.fromChangeLog(log.withColumnRenamed("state", "is_current"),
        Seq("uid"), Seq("is_current"), "ts")
    }
    intercept[IllegalArgumentException] { // ts may not be a generated interval column
      Scd.fromChangeLog(log.withColumnRenamed("ts", "valid_to"),
        Seq("uid"), Seq("state"), "valid_to")
    }
    // a ts column literally named valid_from IS the output column — allowed
    val ok = Scd.fromChangeLog(log.withColumnRenamed("ts", "valid_from"),
      Seq("uid"), Seq("state"), "valid_from")
    assert(ok.columns.count(_ == "valid_from") == 1)
  }

  test("applyUpdates matches null keys null-safely (no duplicate open versions)") {
    val nlog = Seq((Option.empty[Long], 10L, "A"), (Some(9L), 10L, "Z"))
      .toDF("uid", "ts", "state")
    val dim = Scd.fromChangeLog(nlog, Seq("uid"), Seq("state"), "ts")
    val batch = Seq((Option.empty[Long], 20L, "B")).toDF("uid", "ts", "state")
    val merged = Scd.applyUpdates(dim, batch, Seq("uid"), Seq("state"), "ts")
    val nullRows = merged.filter(col("uid").isNull)
      .orderBy("valid_from")
      .select("state", "valid_from", "valid_to", "is_current")
      .as[(String, Long, Option[Long], Boolean)].collect().toSeq
    // the null key's history is ONE chain: A closed at 20, B open
    assert(nullRows == Seq(("A", 10L, Some(20L), false), ("B", 20L, None, true)))
    assert(merged.filter(col("uid") === 9L).count() == 1) // untouched key intact
  }
}
