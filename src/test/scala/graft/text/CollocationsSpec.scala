package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("pmiCollocations: counts and PMI match a by-hand bigram model") {
    // corpus bigrams: (a b)×3, (b a)×2, (c d)×3  — doc edges break pairs
    val docs = Seq("a b a b a b", "c d", "c d", "c d").toDF("text")
    val got = Collocations.pmiCollocations(docs, col("text"), minCount = 2)
      .orderBy("w1", "w2")
      .select("w1", "w2", "cnt", "pmi").as[(String, String, Long, Double)].collect()
    // N=8; c1: a→3, b→2, c→3; c2: b→3, a→2, d→3
    def pmi(c12: Long, c1: Long, c2: Long) =
      math.log(c12.toDouble) + math.log(8.0) - math.log(c1.toDouble) - math.log(c2.toDouble)
    val want = Seq(
      ("a", "b", 3L, pmi(3, 3, 3)), ("b", "a", 2L, pmi(2, 2, 2)),
      ("c", "d", 3L, pmi(3, 3, 3)))
    got.zip(want).foreach { case ((w1, w2, c, p), (ww1, ww2, wc, wp)) =>
      assert((w1, w2, c) === ((ww1, ww2, wc)))
      assert(math.abs(p - wp) < 1e-12)
    }
    assert(got.length === 3)
  }

  test("minCount prunes rare pairs; single-token and empty docs contribute nothing") {
    val docs = Seq("x y", "z", "", "x y").toDF("text")
    val got = Collocations.pmiCollocations(docs, col("text"), minCount = 3).count()
    assert(got === 0L) // (x,y) has count 2 < 3
    val loose = Collocations.pmiCollocations(docs, col("text"), minCount = 1)
      .select("w1", "w2", "cnt").as[(String, String, Long)].collect().toSet
    assert(loose === Set(("x", "y", 2L)))
  }

  test("above-chance pairs score positive, below-chance negative") {
    // bigrams: (u,v)=5, (v,u)=5, (u,u)=1 → N=11, c1(u)=6, c2(u)=6
    val docs = (Seq.fill(5)("u v") ++ Seq.fill(5)("v u") :+ "u u").toDF("text")
    val m = Collocations.pmiCollocations(docs, col("text"), minCount = 1)
      .select("w1", "w2", "pmi").as[(String, String, Double)].collect()
      .map { case (a, b, p) => (a, b) -> p }.toMap
    assert(m(("u", "v")) > 0) // ln(5·11/(6·5)) = ln(11/6)
    assert(m(("u", "u")) < 0) // ln(1·11/(6·6)) = ln(11/36)
  }
}
