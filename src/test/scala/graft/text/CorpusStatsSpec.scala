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

  test("docBigramCrossEntropy matches a hand-computed interpolated case") {
    // bigram events: d1 = (a,b)×2 (b,a)×1; d2 = (a,b); d3 = (b,b)
    // corpus: c(a,b)=3 c(b,a)=1 c(b,b)=1; contexts c(a,·)=3 c(b,·)=2
    // cur-unigrams: c(b)=4 c(a)=1, N=5; λ=0.8
    // P(b|a) = .8·(3/3) + .2·(4/5) = 0.96
    // P(a|b) = .8·(1/2) + .2·(1/5) = 0.44
    // P(b|b) = .8·(1/2) + .2·(4/5) = 0.56
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "b b"), (4L, "solo"))
      .toDF("doc_id", "text")
    val h = CorpusStats.docBigramCrossEntropy(docs, col("doc_id"), col("text"), lambda = 0.8)
      .select("doc_id", "n_bigrams", "xent_bits").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lg = (x: Double) => math.log(x) / math.log(2)
    // "solo" contributes the unigram 'solo' nowhere: it has no bigram
    // events, so it is absent — exactly the w<2-token contract
    assert(!h.contains(4L) && h.size == 3)
    assert(h(1L)._2 == 3L && h(2L)._2 == 1L)
    assert(h(1L)._3 == r4(-(2 * lg(0.96) + lg(0.44)) / 3))
    assert(h(2L)._3 == r4(-lg(0.96)))
    assert(h(3L)._3 == r4(-lg(0.56)))
  }

  test("docBigramCrossEntropy flags scrambled text a unigram model cannot see") {
    // five structured docs + one token-scramble of the same bag: unigram
    // distributions are identical, so d35 scores them equally — the
    // bigram model must rank the scramble strictly higher
    val natural = "x y x y x y"
    val docs = ((1L to 5L).map(i => (i, natural)) :+ (6L, "x x y y x y"))
      .toDF("doc_id", "text")
    val uni = CorpusStats.docCrossEntropy(docs, col("doc_id"), col("text"))
      .select("doc_id", "xent_bits").as[(Long, Double)].collect().toMap
    assert(uni(6L) == uni(1L), "unigram model must NOT separate the scramble")
    val bi = CorpusStats.docBigramCrossEntropy(docs, col("doc_id"), col("text"))
      .select("doc_id", "xent_bits").as[(Long, Double)].collect().toMap
    assert(bi(6L) > bi(1L), s"scramble must score higher: ${bi(6L)} vs ${bi(1L)}")
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

  test("vocabCoverage: boundary ties break by term, coverage hand-checked") {
    import org.apache.spark.sql.functions.col
    // corpus counts: aa×4, bb×3, cc×2, dd×2 — k=3 keeps aa, bb and the
    // tie at count 2 resolves to cc (term order), dd stays out
    val docs = Seq(
      (1L, "aa bb aa cc"),        // 4 tokens, dd absent  → 4/4 in vocab
      (2L, "aa bb cc dd"),        // dd out               → 3/4
      (3L, "dd aa bb aa"))        // dd out               → 3/4
      .toDF("doc_id", "text")
    val out = CorpusStats.vocabCoverage(docs, col("doc_id"), col("text"), 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(1L) == ((4L, 4L, 1.0)))
    assert(out(2L) == ((4L, 3L, 0.75)))
    assert(out(3L) == ((4L, 3L, 0.75)))
  }

  test("qualityDrift: identical slice scores zero; hand-computed PSI/chi2; smoothing") {
    import org.apache.spark.sql.functions.col
    // one slice = the whole corpus → PSI and chi2 exactly 0
    val uni = Seq(("a", 0.05), ("a", 0.55), ("a", 0.95)).toDF("s", "v")
    val r0 = CorpusStats.qualityDrift(uni, col("s"), col("v"), nBins = 2).head()
    assert(r0.getDouble(r0.fieldIndex("psi")) == 0.0)
    assert(r0.getDouble(r0.fieldIndex("chi2")) == 0.0)

    // two fully-separated slices, nBins=2, alpha=0.5 (hand-computed):
    // A: 3 rows in bin 0; B: 3 rows in bin 1
    // p_A = (3.5/4, 0.5/4); q = (3.5/7, 3.5/7)
    // psi_A = 0.375·ln(1.75) − 0.375·ln(0.25) → 0.729716
    // chi2_A = (3−1.5)²/1.5 + (0−1.5)²/1.5 = 3.0
    val two = Seq(("A", 0.1), ("A", 0.2), ("A", 0.3),
      ("B", 0.8), ("B", 0.9), ("B", 0.7)).toDF("s", "v")
    val rows = CorpusStats.qualityDrift(two, col("s"), col("v"), nBins = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(rows("A") == ((3L, 0.729716, 3.0)))
    assert(rows("B") == ((3L, 0.729716, 3.0)))

    // out-of-range values clamp to edge bins rather than vanish
    val clamped = Seq(("a", -5.0), ("a", 99.0)).toDF("s", "v")
    val rc = CorpusStats.qualityDrift(clamped, col("s"), col("v"), nBins = 4).head()
    assert(rc.getLong(rc.fieldIndex("n")) == 2L)
    assert(rc.getDouble(rc.fieldIndex("psi")) == 0.0) // single slice ≡ corpus
  }

  test("zipfFit recovers an exact power law and reports head share") {
    import org.apache.spark.sql.functions.col
    // counts 8/4/2/1 at ranks 1..4 = freq ∝ rank^(−1) exactly in log2,
    // slope in ln is still exactly −log(2)/... no: ln f = ln 8 − r·…
    // freq(r) = 16 / 2^r → ln f = ln16 − r·ln2: linear in RANK, not
    // ln-rank. Use freq(r) = 24/r instead: 24,12,8,6 at ranks 1..4 →
    // ln f = ln 24 − 1·ln r: slope exactly −1, r² = 1.
    val words = Seq.fill(24)("aa") ++ Seq.fill(12)("bb") ++
      Seq.fill(8)("cc") ++ Seq.fill(6)("dd")
    val docs = words.grouped(10).map(_.mkString(" ")).toSeq.toDF("text")
    val r = CorpusStats.zipfFit(docs, col("text"), topK = 4).head()
    assert(r.getLong(0) == 4L)
    assert(math.abs(r.getDouble(1) - (-1.0)) < 1e-6) // slope
    assert(math.abs(r.getDouble(2) - math.log(24.0)) < 1e-6) // intercept
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-6) // r²
    assert(r.getDouble(4) == 1.0) // all 50 tokens are in the top-4 head
  }

  test("heapsFit: exact hand regression; new types credit their first doc only") {
    import org.apache.spark.sql.functions.col
    // doc1 "a b a": 3 tokens, 2 new; doc2 "b c": 2 tokens, 1 new;
    // doc3 "a d d": 3 tokens, 1 new → points (3,2), (5,3), (8,4)
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "a d d")).toDF("doc_id", "text")
    val r = CorpusStats.heapsFit(docs, col("doc_id"), col("text")).head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 8L && r.getLong(2) == 4L)
    val pts = Seq((3.0, 2.0), (5.0, 3.0), (8.0, 4.0))
      .map { case (n, v) => (math.log(n), math.log(v)) }
    val n = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val k = math.exp((sy * sxx - sx * sxy) / (n * sxx - sx * sx))
    assert(math.abs(r.getDouble(3) - beta) < 1e-6)
    assert(math.abs(r.getDouble(4) - k) < 1e-6)
    assert(beta > 0 && beta < 1, "sublinear growth on natural-ish text")
  }

  test("heapsFit: tokenless docs contribute no point; a pure-repeat corpus has beta 0") {
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "x y"), (2L, "  "), (3L, "x y x"), (4L, "y x"))
      .toDF("doc_id", "text")
    val r = CorpusStats.heapsFit(docs, col("doc_id"), col("text")).head()
    // doc2 has no tokens → 3 points: (2,2), (5,2), (7,2); vocab flat
    assert(r.getLong(0) == 3L && r.getLong(1) == 7L && r.getLong(2) == 2L)
    assert(math.abs(r.getDouble(3)) < 1e-12, "constant vocabulary fits beta = 0")
    // r2's zero-variance guard fires only on an EXACT fp zero (e.g. a
    // single point); ln-sums here leave an epsilon, so r2 is merely
    // numerically meaningless — beta, the decision value, is clean
    val single = Seq((1L, "a b")).toDF("doc_id", "text")
    val r1 = CorpusStats.heapsFit(single, col("doc_id"), col("text")).head()
    assert(r1.isNullAt(r1.fieldIndex("beta")) && r1.isNullAt(r1.fieldIndex("r2")),
      "one point cannot fix a slope — null, not DIVIDE_BY_ZERO")
  }

  test("zipfFit head_share and ties: k below vocabulary, term-order ties") {
    import org.apache.spark.sql.functions.col
    // aa×4, bb×2, cc×2, dd×1; k=2 keeps aa and the count-2 tie → bb
    val docs = Seq("aa aa bb cc", "aa aa bb cc dd").toDF("text")
    val r = CorpusStats.zipfFit(docs, col("text"), topK = 2).head()
    assert(r.getLong(0) == 2L)
    assert(math.abs(r.getDouble(4) - 0.666667) < 1e-6)
  }

  test("burstiness: bursty term ≫ evenly-spread term, exact closed-form values, minTotal prunes") {
    // "z" bursts (4 in one doc of 4); "a" spreads (1 in each of 3 docs)
    val docs = Seq((1L, "z z z z"), (2L, "a"), (3L, "a"), (4L, "a"))
      .toDF("doc_id", "text")
    val got = CorpusStats.burstiness(docs, col("doc_id"), col("text"), minTotal = 1)
      .orderBy("token").select("token", "df", "total", "vmr")
      .as[(String, Long, Long, Double)].collect()
    // a: N=4, μ=0.75, E[c²]=0.75 → var=0.1875 → vmr=0.25
    // z: μ=1, E[c²]=4 → var=3 → vmr=3
    assert(got.map(r => (r._1, r._2, r._3)).toSeq === Seq(("a", 3L, 3L), ("z", 1L, 4L)))
    assert(math.abs(got(0)._4 - 0.25) < 1e-12)
    assert(math.abs(got(1)._4 - 3.0) < 1e-12)
    assert(got(1)._4 > got(0)._4)
    assert(CorpusStats.burstiness(docs, col("doc_id"), col("text"), minTotal = 4)
      .select("token").as[String].collect().toSeq === Seq("z"))
  }

  test("logOddsShift: counts and δ/z match the Monroe formula by hand; swap negates δ") {
    // target "a a b" (na=3), rest "a b b b" (nb=4); α0=7 → α_a=3, α_b=4
    val docs = Seq(("a a b", true), ("a b b b", false)).toDF("text", "tgt")
    val got = CorpusStats.logOddsShift(docs, col("text"), col("tgt"), alpha0 = 7.0)
      .orderBy("token")
      .select("token", "y_a", "y_b", "delta", "z")
      .as[(String, Long, Long, Double, Double)].collect()
    def ref(ya: Long, yb: Long, aw: Double, na: Long, nb: Long): (Double, Double) = {
      val d = math.log((ya + aw) / (na + 7.0 - ya - aw)) -
        math.log((yb + aw) / (nb + 7.0 - yb - aw))
      (d, d / math.sqrt(1.0 / (ya + aw) + 1.0 / (yb + aw)))
    }
    val (da, za) = ref(2, 1, 3.0, 3, 4)
    val (db, zb) = ref(1, 3, 4.0, 3, 4)
    assert(got.map(r => (r._1, r._2, r._3)).toSeq === Seq(("a", 2L, 1L), ("b", 1L, 3L)))
    assert(math.abs(got(0)._4 - da) < 1e-12 && math.abs(got(0)._5 - za) < 1e-12)
    assert(math.abs(got(1)._4 - db) < 1e-12 && math.abs(got(1)._5 - zb) < 1e-12)
    assert(da > 0 && db < 0) // "a" is the target's word, "b" the rest's
    // swapping the slice flag negates every delta
    val sw = CorpusStats.logOddsShift(docs, col("text"), !col("tgt"), alpha0 = 7.0)
      .orderBy("token").select("delta").as[Double].collect()
    assert(math.abs(sw(0) + da) < 1e-12 && math.abs(sw(1) + db) < 1e-12)
  }

  test("logOddsShift: identically-distributed slices score δ=0; ONE explosion in the plan") {
    val docs = Seq(("x y", true), ("x y", false)).toDF("text", "tgt")
    val d = CorpusStats.logOddsShift(docs, col("text"), col("tgt"))
      .select("delta").as[Double].collect()
    assert(d.forall(v => math.abs(v) < 1e-12))
    val shape = graft.PlanShapes.executedShape(
      CorpusStats.logOddsShift(docs, col("text"), col("tgt")))
    assert(shape.generates === 1, s"fused pass must explode exactly once: $shape")
  }
}
