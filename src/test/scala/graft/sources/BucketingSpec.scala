package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def hasShuffle(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.exists {
      case _: ShuffleExchangeExec => true
      case _ => false
    }

  test("co-bucketed, co-sorted tables join with NO shuffle exchange") {
    val facts = (0L until 1000L).map(i => (i % 100, i, i * 2.0)).toDF("k", "id", "v")
    val dims = (0L until 100L).map(i => (i, s"name_$i")).toDF("k", "name")
    Bucketing.writeBucketed(facts, "b_facts", "k", 4, sortCols = Seq("k"))
    Bucketing.writeBucketed(dims, "b_dims", "k", 4, sortCols = Seq("k"))
    try {
      // disable auto-broadcast so the join would otherwise shuffle both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
      assert(!hasShuffle(joined), "bucketed join still shuffles:\n" + joined.queryExecution.executedPlan)
      assert(joined.count() == 1000)
      // same result as the shuffled join over the raw frames
      val expected = facts.join(dims, "k").agg(sum("v")).as[Double].head()
      assert(joined.agg(sum("v")).as[Double].head() == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }

  test("mismatched bucket counts fall back to a shuffled (still correct) join") {
    val a = (0L until 100L).map(i => (i, i)).toDF("k", "x")
    val b = (0L until 100L).map(i => (i, i * 10)).toDF("k", "y")
    Bucketing.writeBucketed(a, "b_a", "k", 4)
    Bucketing.writeBucketed(b, "b_b", "k", 3)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_a").join(spark.table("b_b"), "k")
      assert(joined.count() == 100) // correctness unaffected
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_a")
      spark.sql("DROP TABLE IF EXISTS b_b")
    }
  }
}
