package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpanExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def mask(toks: Seq[String], starts: Seq[Int], w: Int): Seq[String] =
    Seq((toks, starts)).toDF("t", "s")
      .select(SpanExpressions.spanMask(col("t"), col("s"), w).as("k"))
      .head().getSeq[String](0)

  test("single window drops exactly w tokens") {
    assert(mask(Seq("a", "b", "c", "d", "e"), Seq(1), 3) == Seq("a", "e"))
  }

  test("overlapping and touching windows merge coverage") {
    // [1,3] and [2,4] cover 1..4; [6,7] separate (w=2)
    assert(mask((0 to 8).map(_.toString), Seq(1, 2, 6), 2)
      == Seq("0", "4", "5", "8"))
  }

  test("empty starts is the identity fast path") {
    assert(mask(Seq("x", "y"), Seq(), 4) == Seq("x", "y"))
  }

  test("window past the end clips; start at 0 covers the head") {
    assert(mask(Seq("a", "b", "c"), Seq(0), 2) == Seq("c"))
    assert(mask(Seq("a", "b", "c"), Seq(2), 5) == Seq("a", "b"))
  }

  test("null elements survive or drop purely by position") {
    val r = Seq((Seq("a", null, "c", null), Seq(1))).toDF("t", "s")
      .select(SpanExpressions.spanMask(col("t"), col("s"), 1).as("k"))
      .head().getSeq[String](0)
    assert(r == Seq("a", "c", null))
  }

  test("matches the interpreted HOF formulation on random inputs") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(60) {
      val n = 1 + rnd.nextInt(30)
      val toks = Seq.fill(n)(rnd.nextInt(5).toString)
      val starts = Seq.fill(rnd.nextInt(5))(rnd.nextInt(n)).distinct.sorted
      (toks, starts)
    }
    val w = 3
    val df = rows.toDF("t", "s")
    val both = df.select(
      SpanExpressions.spanMask(col("t"), col("s"), w).as("native"),
      filter(col("t"), (x, i) =>
        !exists(col("s"), st => st <= i && i <= st + (w - 1))).as("hof"))
    assert(both.filter(not(col("native") <=> col("hof"))).count() == 0L)
  }
}
