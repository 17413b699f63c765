package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("identical sources diverge by 0; an idiosyncratic source by more") {
    val docs = Seq(
      ("a", "x y z x y z"),
      ("b", "x y z x y z"),       // same distribution as a
      ("c", "q q q q q q"))       // token the others never use
      .toDF("source", "text")
    val rep = CorpusStats.sourceDivergence(docs, col("source"), col("text"))
      .select("source", "n_tokens", "n_distinct", "kl_bits")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(rep("a")._2 == 6L && rep("a")._3 == 3L)
    assert(rep("a")._4 == rep("b")._4)
    // a and b each hold 1/3 of the corpus with identical distributions;
    // their KL to the blend is small but non-zero (the blend includes q)
    assert(rep("c")._4 > rep("a")._4,
      s"idiosyncratic source must diverge more: ${rep("c")._4} vs ${rep("a")._4}")
    // KL(p || mixture covering p's support) is non-negative (Gibbs)
    rep.values.foreach(r => assert(r._4 >= 0.0, s"negative KL for ${r._1}"))
  }

  test("kl matches a hand-computed two-source case") {
    // source a: 3×u 1×v (p = .75/.25); source b: 1×u 3×v
    // corpus q(u) = q(v) = .5 → KL(a‖corpus) = .75·log2(1.5) + .25·log2(.5)
    val docs = Seq(("a", "u u u v"), ("b", "u v v v")).toDF("source", "text")
    val kl = CorpusStats.sourceDivergence(docs, col("source"), col("text"))
      .filter(col("source") === "a").select("kl_bits").as[Double].head()
    val expected = 0.75 * math.log(1.5) / math.log(2) + 0.25 * math.log(0.5) / math.log(2)
    assert(math.abs(kl - BigDecimal(expected).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("docCrossEntropy matches a hand-computed case and ranks rarity") {
    // corpus: u×6, v×2 → q(u)=.75, q(v)=.25
    // doc 1 = "u u u" → H = −log2(.75); doc 2 = "u v" → (−log2(.75)−log2(.25))/2
    val docs = Seq((1L, "u u u"), (2L, "u v"), (3L, "u u v")).toDF("doc_id", "text")
    val h = CorpusStats.docCrossEntropy(docs, col("doc_id"), col("text"))
      .select("doc_id", "xent_bits").as[(Long, Double)].collect().toMap
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lg = (x: Double) => math.log(x) / math.log(2)
    assert(h(1L) == r4(-lg(0.75)))
    assert(h(2L) == r4(-(lg(0.75) + lg(0.25)) / 2))
    assert(h(2L) > h(1L)) // the rare-token doc is higher-entropy
  }
}
