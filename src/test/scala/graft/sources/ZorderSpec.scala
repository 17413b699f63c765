package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZorderSpec extends SparkSpec {
  import spark.implicits._

  // reference interleave: col j's bit i → position i*n+j
  private def refZ(vals: Seq[Long], bits: Int): Long =
    (for { (v, j) <- vals.zipWithIndex; i <- 0 until bits }
      yield ((v >> i) & 1L) << (i * vals.size + j)).sum

  test("zValue interleaves bits exactly like the reference implementation") {
    val rows = Seq((5L, 3L), (0L, 0L), (7L, 7L), (4L, 1L), (63L, 21L))
    val got = rows.toDF("x", "y")
      .select(Zorder.zValue(Seq(col("x"), col("y")), bits = 6).as("z"))
      .as[Long].collect().toSeq
    assert(got == rows.map { case (x, y) => refZ(Seq(x, y), 6) })
  }

  test("zValue: nulls land at the curve origin; 3-column interleave") {
    val z3 = Seq((Some(2L), 5L, 1L), (None, 5L, 1L)).toDF("a", "b", "c")
      .select(Zorder.zValue(Seq(col("a"), col("b"), col("c")), bits = 4).as("z"))
      .as[Long].collect().toSeq
    assert(z3(0) == refZ(Seq(2L, 5L, 1L), 4))
    assert(z3(1) == refZ(Seq(0L, 5L, 1L), 4)) // null → 0
  }

  test("normalize scales to [0, 2^bits) and clamps out-of-range values") {
    val out = Seq(-10.0, 0.0, 50.0, 100.0, 999.0).toDF("v")
      .select(Zorder.normalize(col("v"), 0.0, 100.0, 8).as("n"))
      .as[Long].collect().toSeq
    assert(out == Seq(0L, 0L, 128L, 255L, 255L))
  }

  test("z-ordered files prune a second-dimension filter; linear sort cannot") {
    // 64×64 grid, 16 files ⇒ each z-ordered file is a 16×16 tile
    val grid = spark.range(64L * 64)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val zDir = java.nio.file.Files.createTempDirectory("graft-z").toString
    val xDir = java.nio.file.Files.createTempDirectory("graft-x").toString
    Zorder.writeZOrdered(grid, zDir, Zorder.zValue(Seq(col("x"), col("y")), 6), nFiles = 16)
    grid.withColumn("__s", col("x")).repartitionByRange(16, col("__s"))
      .sortWithinPartitions("__s").drop("__s").write.mode("overwrite").parquet(xDir)

    // per-file bounding boxes — what parquet min/max stats expose to pruning
    def filesIntersecting(dir: String): Long =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("y").as("y0"), max("y").as("y1"))
        .filter(col("y0") < 8) // the y < 8 box query
        .count()
    val zFiles = filesIntersecting(zDir)
    val xFiles = filesIntersecting(xDir)
    assert(zFiles <= 4, s"z-order should confine y<8 to one tile row, got $zFiles files")
    assert(xFiles == 16, s"x-sorted layout cannot prune on y, got $xFiles files")
    // and the layout changes nothing about the data itself
    assert(spark.read.parquet(zDir).filter(col("y") < 8).count() == 8 * 64)
  }

  test("zValue rejects widths that overflow a positive long") {
    intercept[IllegalArgumentException] {
      Zorder.zValue(Seq(col("x"), col("y")), bits = 32)
    }
    intercept[IllegalArgumentException] { Zorder.zValue(Seq(col("x")), bits = 8) }
  }
}
