package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextRankSpec extends SparkSpec {
  import spark.implicits._

  /** Naive reference: same tokenizer, same symmetric pooled counts,
    * same minCount, same fixed-point iteration — independent code. */
  private def naive(docs: Seq[String], d: Double, iters: Int,
      minCount: Long): Map[String, Double] = {
    val pairs = docs.flatMap { doc =>
      val t = doc.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      t.zip(t.drop(1)).filter { case (a, b) => a != b }
    }
    val sym = pairs ++ pairs.map(_.swap)
    val w = sym.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= minCount).toMap
    val outW = w.groupBy(_._1._1).view.mapValues(_.values.sum.toDouble).toMap
    val verts = w.keySet.map(_._1)
    var r = verts.map(_ -> 1.0).toMap
    for (_ <- 0 until iters) {
      r = verts.map { v =>
        val in = w.collect { case ((j, i), c) if i == v => r(j) * c / outW(j) }.sum
        v -> ((1 - d) + d * in)
      }.toMap
    }
    r
  }

  test("textRank: equals an independent reference on a mixed corpus") {
    val docs = Seq(
      "spark runs fast and spark scales well",
      "fast spark jobs and fast queries",
      "queries scale and jobs scale",
      "spark queries run fast")
    val got = TextRank.textRank(docs.toDF("text"), col("text"),
        damping = 0.85, iters = 4, minCount = 1)
      .as[(String, Double)].collect().toMap
    val want = naive(docs, 0.85, 4, 1)
    assert(got.keySet === want.keySet)
    for ((k, v) <- want) assert(math.abs(got(k) - v) < 1e-9, s"token $k")
  }

  test("textRank: a two-word graph sits at its fixed point; hub outranks leaves") {
    // "a b" alone: p(a→b)=p(b→a)=1, init 1 → rank stays exactly 1
    val pairDf = Seq("a b", "a b").toDF("text")
    val pair = TextRank.textRank(pairDf, col("text"), iters = 3, minCount = 1)
      .as[(String, Double)].collect().toMap
    assert(pair === Map("a" -> 1.0, "b" -> 1.0))
    // star: hub adjacent to 4 distinct leaves → hub collects 4 full votes
    val star = Seq("hub x1", "hub x2", "hub x3", "hub x4").toDF("text")
    val r = TextRank.textRank(star, col("text"), iters = 5, minCount = 1)
      .as[(String, Double)].collect().toMap
    assert(Seq("x1", "x2", "x3", "x4").forall(l => r("hub") > r(l)))
  }

  test("textRank: self-loops dropped, minCount prunes, pooled symmetric counts") {
    // "x x x y": (x,x) pairs dropped, only x-y survives
    val got = TextRank.textRank(Seq("x x x y").toDF("text"), col("text"),
        iters = 2, minCount = 1)
      .as[(String, Double)].collect().toMap
    assert(got.keySet === Set("x", "y"))
    // "a b" once + "b a" once pools to undirected weight 2 ≥ minCount 2,
    // while "c d" once (weight 1 each way) is pruned entirely
    val pooled = TextRank.textRank(Seq("a b", "b a", "c d").toDF("text"),
        col("text"), iters = 2, minCount = 2)
      .as[(String, Double)].collect().toMap
    assert(pooled.keySet === Set("a", "b"))
  }
}
