package graft

/** Diagnostic: print one query's FINAL adaptive plan (post-execution)
  * to see whether duplicate subtrees were stage-reused or re-executed.
  * `sbt "Test/runMain graft.PlanAudit2 d35_doc_xentropy"`. */
object PlanAudit2 {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("d35_doc_xentropy")
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
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    df.collect()
    println("==== FINAL PLAN ====")
    val fin = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    println(fin.toString.take(12000))
    def executedScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] = p match {
      case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq.empty
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => executedScans(q.plan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => executedScans(a.executedPlan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        Seq(s.relation.location.rootPaths.headOption.map(_.getName).getOrElse("?"))
      case other => other.children.flatMap(executedScans) ++ other.subqueries.flatMap(executedScans)
    }
    def executedGenerates(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => 0
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => executedGenerates(q.plan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => executedGenerates(a.executedPlan)
      case g: org.apache.spark.sql.execution.GenerateExec =>
        1 + g.children.map(executedGenerates).sum
      case other => other.children.map(executedGenerates).sum + other.subqueries.map(executedGenerates).sum
    }
    println(s"EXECUTED scans: ${executedScans(fin).groupBy(identity).view.mapValues(_.size).toMap}")
    println(s"EXECUTED generates: ${executedGenerates(fin)}")
    spark.stop()
  }
}
