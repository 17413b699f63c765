package graft

/** Ad-hoc executed-shape stability probe: run a query N times in one
  * session and print each executed shape — flushes out AQE plan-shape
  * races (the d23b class) before they flake the golden suite. */
object ShapeCheck {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args(0)
    val n = if (args.length > 1) args(1).toInt else 5
    (1 to n).foreach { i =>
      val shape = PlanShapes.executedShape(
        SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")).toString
      println(s"SHAPE $name run$i $shape")
    }
    spark.stop()
  }
}
