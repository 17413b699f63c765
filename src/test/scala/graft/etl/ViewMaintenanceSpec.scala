package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ViewMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def multiset(df: DataFrame): Map[String, Long] =
    df.collect().map(_.mkString("|")).groupBy(identity).view.mapValues(_.length.toLong).toMap

  // A: (k, av)   B: (k, bv)
  private val aOld = Seq((1L, "a1"), (2L, "a2"), (2L, "a2dup"), (3L, "a3")).toDF("k", "av")
  private val bOld = Seq((1L, "b1"), (2L, "b2"), (4L, "b4")).toDF("k", "bv")

  test("incremental refresh equals full recompute under mixed inserts/deletes on both sides") {
    val v0 = aOld.join(bOld, Seq("k"))
    // ΔA: delete (2,'a2'), insert (4,'a4') and (5,'a5')
    val dA = Seq((2L, "a2", -1L), (4L, "a4", 1L), (5L, "a5", 1L)).toDF("k", "av", "__mult")
    // ΔB: delete (1,'b1'), insert (5,'b5')  — (5,5) exercises ΔA ⋈ ΔB
    val dB = Seq((1L, "b1", -1L), (5L, "b5", 1L)).toDF("k", "bv", "__mult")
    val v1 = ViewMaintenance.refreshJoinView(v0, aOld, dA, bOld, dB, Seq("k"))

    val aNew = Seq((1L, "a1"), (2L, "a2dup"), (3L, "a3"), (4L, "a4"), (5L, "a5")).toDF("k", "av")
    val bNew = Seq((2L, "b2"), (4L, "b4"), (5L, "b5")).toDF("k", "bv")
    assert(multiset(v1) == multiset(aNew.join(bNew, Seq("k"))))
  }

  test("duplicate rows keep exact multiplicities through delta application") {
    val v0 = aOld.join(bOld, Seq("k"))
    // inserting ANOTHER (2,'a2') bumps the (2,a2,b2) view row to mult 2
    val dA = Seq((2L, "a2", 1L)).toDF("k", "av", "__mult")
    val dB = Seq.empty[(Long, String, Long)].toDF("k", "bv", "__mult")
    val v1 = ViewMaintenance.refreshJoinView(v0, aOld, dA, bOld, dB, Seq("k"))
    assert(multiset(v1)("2|a2|b2") == 2L)
  }

  test("strict mode surfaces an inconsistent delete instead of clamping") {
    val v0 = aOld.join(bOld, Seq("k"))
    val dA = Seq((1L, "NOT-IN-A", -1L)).toDF("k", "av", "__mult")
    val dB = Seq.empty[(Long, String, Long)].toDF("k", "bv", "__mult")
    // ΔV contains (1, NOT-IN-A, b1) with mult −1; the view never had it
    intercept[Exception] {
      ViewMaintenance.refreshJoinView(v0, aOld, dA, bOld, dB, Seq("k")).collect()
    }
  }

  test("refreshAggView: incremental count/sum equals full recompute; zero groups vanish") {
    val base = Seq(("a", 1.0), ("a", 3.0), ("b", 5.0), ("c", 2.0)).toDF("k", "x")
    val view = base.groupBy("k").agg(count(lit(1)).as("n"), sum("x").as("x"))
    // delete (a,3), insert (a,7) and (d,4), delete c's only row
    val delta = Seq(("a", 3.0, -1L), ("a", 7.0, 1L), ("d", 4.0, 1L), ("c", 2.0, -1L))
      .toDF("k", "x", "__mult")
    val got = ViewMaintenance.refreshAggView(view, delta, Seq("k"), Seq("x"))
      .orderBy("k").as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("a", 2L, 8.0), ("b", 1L, 5.0), ("d", 1L, 4.0)))
  }

  test("refreshAggView: strict mode surfaces a count driven negative") {
    val view = Seq(("a", 1L, 2.0)).toDF("k", "n", "x")
    val delta = Seq(("a", 2.0, -1L), ("a", 9.0, -1L)).toDF("k", "x", "__mult")
    intercept[Exception] {
      ViewMaintenance.refreshAggView(view, delta, Seq("k"), Seq("x")).collect()
    }
    // non-strict clamps the group away instead
    val lenient = ViewMaintenance.refreshAggView(view, delta, Seq("k"), Seq("x"),
      strict = false).collect()
    assert(lenient.isEmpty)
  }

  test("disjoint-column and key contracts are enforced") {
    val clash = Seq((1L, "x")).toDF("k", "av") // same non-key name as A
    intercept[IllegalArgumentException] {
      ViewMaintenance.joinDelta(aOld, aOld.withColumn("__mult", lit(1L)),
        clash, clash.withColumn("__mult", lit(1L)), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      ViewMaintenance.joinDelta(aOld, aOld, bOld, bOld, Seq("k")) // deltas missing __mult
    }
  }
}
