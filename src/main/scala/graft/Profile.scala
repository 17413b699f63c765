package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1): for each named
  * query, run once untimed (JIT/codegen warm), then re-run under a
  * job listener and print a per-job wall breakdown (job id, duration,
  * stage/task counts, first line of the active job group description)
  * plus total wall — the intra-query decomposition Bench's single
  * number can't give. Also dumps `.explain("formatted")` for the
  * query's returned frame to `<outDir>/<name>_explain.txt` (the
  * plans/r13 before/after artifacts). Never part of the graded
  * surface; tooling only.
  *
  * Usage: runMain graft.Profile <sfDir> <outDir> <q1,q2,...> [cold]
  * `cold` skips the warm-up run so the first-run codegen cost lands
  * in the breakdown (that is most of some queries' bench cold time).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val cold = args.length > 3 && args(3) == "cold"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", graft.sources.Tmp.dir("graft-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    spark.range(1000000L).selectExpr("sum(id * 2)")
      .write.format("noop").mode("overwrite").save()

    final class JobTimes extends SparkListener {
      case class J(start: Long, desc: String, var stages: Int = 0, var tasks: Int = 0)
      val jobs = scala.collection.mutable.LinkedHashMap[Int, (J, Long)]()
      private val open = scala.collection.mutable.Map[Int, J]()
      override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        open(e.jobId) = J(System.nanoTime(), d.take(90))
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = synchronized {
        open.values.foreach { j => j.stages += 1; j.tasks += e.stageInfo.numTasks }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
        open.remove(e.jobId).foreach(j => jobs(e.jobId) = (j, System.nanoTime()))
      }
    }

    def releaseRunState(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }

    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"== $name: NOT FOUND ==")
        case Some(fn) =>
          if (!cold) {
            try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
            catch { case e: Throwable => println(s"== $name warmup FAILED: ${e.getMessage}") }
            releaseRunState()
          }
          val lis = new JobTimes
          spark.sparkContext.addSparkListener(lis)
          val t0 = System.nanoTime()
          val df =
            try {
              val d = fn(spark, sfDir)
              d.write.format("noop").mode("overwrite").save()
              Some(d)
            } catch { case e: Throwable =>
              println(s"== $name FAILED: ${e.getMessage}"); None
            }
          val wall = (System.nanoTime() - t0) / 1e9
          // let straggler listener events drain before reading
          Thread.sleep(300)
          spark.sparkContext.removeSparkListener(lis)
          println(f"== $name wall=$wall%.3f s jobs=${lis.jobs.size} ==")
          lis.jobs.foreach { case (id, (j, end)) =>
            val dur = (end - j.start) / 1e9
            if (dur >= 0.005)
              println(f"  job $id%3d $dur%7.3f s stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.desc}")
          }
          val jobSum = lis.jobs.map { case (_, (j, e)) => (e - j.start) / 1e9 }.sum
          println(f"  [sum of jobs $jobSum%.3f s; gap (driver/planning) ${wall - jobSum}%.3f s]")
          df.foreach { d =>
            val txt = d.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(s"$outDir/${name}_explain.txt"), txt)
          }
          releaseRunState()
      }
    }
    spark.stop()
  }
}
