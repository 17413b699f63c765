package graft

import org.apache.spark.sql.execution.FileSourceScanExec

/** Diagnostic (not a test): prints each query's static physical-plan
  * parquet-scan count at sf0.001, flagging plans that scan a table more
  * often than its distinct-path count — the multi-parent re-execution
  * smell ScanSpec pins for d28/d31/d15. Run with
  * `sbt "Test/runMain graft.PlanAudit"`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        // execute first: the FINAL adaptive plan replaces duplicate
        // subtrees that were actually deduped with ReusedExchangeExec
        // (no children), so the post-run collect counts scans that RAN
        df.collect()
        val plan = df.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        // recurse into materialized query stages; a ReusedExchange means
        // that subtree executed ONCE elsewhere, so stop there
        def executedScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] = p match {
          case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq.empty
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => executedScans(q.plan)
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => executedScans(a.executedPlan)
          case s: FileSourceScanExec =>
            Seq(s.relation.location.rootPaths.headOption.map(_.getName).getOrElse("?"))
          case other => other.children.flatMap(executedScans) ++
            other.subqueries.flatMap(executedScans)
        }
        val perTable = executedScans(plan).groupBy(identity).view.mapValues(_.size).toMap
        val total = perTable.values.sum
        val multi = perTable.filter(_._2 > 1)
        println(f"$name%-26s scans=$total%2d  ${if (multi.nonEmpty) multi.mkString(" MULTI: ", ", ", "") else ""}")
      } catch { case e: Throwable => println(f"$name%-26s ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
