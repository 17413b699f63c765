package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("setHitCounts matches the filter(isin) formulation on random token arrays") {
    val sets = Seq(Seq("the", "a", "of"), Seq("der", "die", "the"), Seq("zz"))
    val vocab = Array("the", "a", "of", "der", "die", "zz", "cat", "dog", "x9")
    val rnd = new scala.util.Random(7)
    val docs = (0 until 100).map(_ => Tuple1(Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.length)))))
    val df = docs.toDF("t")
    val native = df.select(TextExpressions.setHitCounts(col("t"), sets).as("h"))
      .as[Seq[Long]].collect()
    val hof = df.select(array(sets.map(ws =>
        size(filter(col("t"), w => w.isin(ws: _*))).cast("long")): _*).as("h"))
      .as[Seq[Long]].collect()
    assert(native.toSeq == hof.toSeq)
  }

  test("setHitCounts: null tokens count nowhere; null array yields null; overlap counts twice") {
    val sets = Seq(Seq("a"), Seq("a", "b"))
    val df = Seq(
      Some(Seq(Some("a"), None, Some("b"), Some("a"))),
      Option.empty[Seq[Option[String]]]
    ).toDF("t")
    val out = df.select(TextExpressions.setHitCounts(col("t"), sets).as("h")).collect()
    assert(out(0).getSeq[Long](0) == Seq(2L, 3L)) // 'a'×2 in both sets, 'b' only in set 1
    assert(out(1).isNullAt(0))
  }

  test("fleschCounts matches the filter(rlike)+aggregate(regexp) HOF formulation") {
    val rnd = new scala.util.Random(11)
    val vocab = Seq("the", "beautiful", "rhythm", "a", "99", "...", "--", "syzygy",
      "queueing", "idea", "xyz", "y", "aeiou", "don't", "it's")
    val rows = Seq.fill(80)(Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))))
    val df = rows.toDF("t")
    val both = df.select(
      TextExpressions.fleschCounts(col("t")).as("native"),
      array(
        size(filter(col("t"), w => w.rlike("[a-z0-9]"))).cast("long"),
        coalesce(aggregate(filter(col("t"), w => w.rlike("[a-z0-9]")), lit(0L),
          (acc, w) => acc + greatest(size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0))), lit(1)).cast("long")),
          lit(0L))).as("hof"))
    assert(both.filter(not(col("native") <=> col("hof"))).count() == 0L)
    // null array propagates
    val nl = Seq(Option.empty[Seq[String]]).toDF("t")
      .select(TextExpressions.fleschCounts(col("t")).as("n")).collect()
    assert(nl(0).isNullAt(0))
  }
}
