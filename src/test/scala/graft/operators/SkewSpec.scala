package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec}
import org.apache.spark.sql.functions._

/** Pins the SURVEY claim that AQE absorbs join skew at runtime: a
  * sort-merge join with one pathological key must come back from
  * execution with its skewed partition SPLIT by AQE (the salted join,
  * C13, remains the explicit-control alternative). Thresholds are
  * lowered to trigger at test scale; they are runtime-settable AQE
  * confs, restored after the test. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the skewed partition of a sort-merge join at runtime") {
    val aqeConfs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      // keep the join a sort-merge join: AQE's broadcast conversion would
      // dissolve the skew instead of splitting it
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = aqeConfs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    aqeConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 100k rows on ONE key vs a trickle on 50 others; payload widens
      // the skewed partition past the lowered threshold
      // incompressible payload (md5) that the aggregate CONSUMES, so
      // column pruning can't drop it and the skewed partition's shuffle
      // bytes actually exceed the lowered threshold
      val skewed = spark.range(100000)
        .select(when(col("id") < 90000, 0L).otherwise(col("id") % 50 + 1).as("k"),
          md5(col("id").cast("string")).as("pad"))
      val dim = spark.range(51).select(col("id").as("k"), (col("id") * 2).as("v"))
      // NOTE: aggregate on something other than k — a groupBy(k) directly
      // downstream would reuse the join's hash partitioning, and AQE
      // (correctly) refuses to split a skewed partition another operator
      // depends on. That interaction is itself worth knowing at scale.
      val joined = skewed.join(dim, "k")
        .agg(count(lit(1)).as("n"), sum(when(col("k") === 0, 1L).otherwise(0L)).as("n0"),
          max("pad").as("mp"))
      val row = joined.collect().head
      assert(row.getLong(0) == 100000L && row.getLong(1) == 90000L && row.getString(2).nonEmpty)
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // QueryStageExec wrappers are leaves — descend into their plans
      def allNodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
        p +: (p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allNodes(q.plan)
          case _ => p.children.flatMap(allNodes)
        })
      val skewReads = allNodes(finalPlan).collect {
        case r: AQEShuffleReadExec if r.hasSkewedPartition => r
      }
      assert(skewReads.nonEmpty,
        s"AQE did not mark the join skewed — final plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
