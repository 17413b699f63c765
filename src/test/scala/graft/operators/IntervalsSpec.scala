package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  test("intervalJoin equals the brute-force overlap join, each pair exactly once") {
    // deterministic pseudo-random half-open intervals, many spanning
    // multiple cells (lengths up to 40 vs cellWidth 10)
    val ls = (1 to 60).map { i =>
      val s = (i * 37) % 100; (i.toLong, s.toLong, (s + 1 + (i * 13) % 40).toLong)
    }
    val rs = (1 to 60).map { i =>
      val s = (i * 53) % 100; (i.toLong + 1000, s.toLong, (s + 1 + (i * 29) % 40).toLong)
    }
    val left = ls.toDF("lid", "ls", "le")
    val right = rs.toDF("rid", "rs", "re")
    val got = Intervals.intervalJoin(left, col("ls"), col("le"),
        right, col("rs"), col("re"), cellWidth = 10)
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    val want = (for {
      (lid, s1, e1) <- ls; (rid, s2, e2) <- rs
      if s1 < e2 && s2 < e1
    } yield (lid, rid)).sorted
    assert(got === want) // equality on Seq (not Set) proves exactly-once
  }

  test("half-open semantics: touching intervals do not overlap; degenerate dropped") {
    val left = Seq((1L, 0L, 10L), (2L, 5L, 5L)).toDF("lid", "ls", "le")
    val right = Seq((9L, 10L, 20L)).toDF("rid", "rs", "re")
    assert(Intervals.intervalJoin(left, col("ls"), col("le"),
      right, col("rs"), col("re"), 10).count() === 0L)
  }

  test("allenRelation classifies all 13 relations") {
    val cases = Seq(
      (0L, 2L, 5L, 9L, "before"), (0L, 5L, 5L, 9L, "meets"),
      (6L, 9L, 0L, 5L, "after"), (5L, 9L, 0L, 5L, "meets-inv"),
      (3L, 7L, 3L, 7L, "equal"), (3L, 5L, 3L, 7L, "starts"),
      (3L, 9L, 3L, 7L, "starts-inv"), (5L, 7L, 3L, 7L, "finishes"),
      (1L, 7L, 3L, 7L, "finishes-inv"), (1L, 9L, 3L, 7L, "contains"),
      (4L, 6L, 3L, 7L, "during"), (1L, 5L, 3L, 7L, "overlaps"),
      (5L, 9L, 3L, 7L, "overlaps-inv"))
    val got = cases.toDF("ls", "le", "rs", "re", "want")
      .select(col("want"),
        Intervals.allenRelation(col("ls"), col("le"), col("rs"), col("re")).as("got"))
      .as[(String, String)].collect()
    got.foreach { case (want, g) => assert(g === want, s"expected $want got $g") }
  }

  test("the join is an equi-join on the cell — never a cartesian/nested-loop") {
    val left = spark.range(200).select(col("id").as("lid"),
      (col("id") * 7 % 500).as("ls"), (col("id") * 7 % 500 + 20).as("le"))
    val right = spark.range(200).select((col("id") + 5000).as("rid"),
      (col("id") * 11 % 500).as("rs"), (col("id") * 11 % 500 + 20).as("re"))
    val df = Intervals.intervalJoin(left, col("ls"), col("le"),
      right, col("rs"), col("re"), 25)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"interval join degenerated to an unbounded join:\n$plan")
  }
}
