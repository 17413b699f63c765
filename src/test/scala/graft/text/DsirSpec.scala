package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 256

  test("lambda weights separate target-like from raw-only text") {
    val target = Seq.fill(20)("alpha beta gamma delta").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val raw = (Seq.fill(20)("alpha beta gamma delta") ++ Seq.fill(20)("zz yy xx ww"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val lam = Dsir.lambdaWeights(target, raw, col("text"), dim)
    val scored = Dsir.scoreDocuments(
      Seq((1L, "alpha beta gamma delta"), (2L, "zz yy xx ww")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), lam)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(1L) > 0.0, s"target-like doc should have positive log-weight, got ${scored(1L)}")
    assert(scored(2L) < scored(1L))
  }

  test("lambdaWeightsWithin equals the two-pass lambdaWeights on a subset target") {
    val raw = (Seq.fill(10)("alpha beta gamma") ++ Seq.fill(10)("zz yy xx"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t, i < 10) }
      .toDF("doc_id", "text", "is_target")
    val twoPass = Dsir.lambdaWeights(
      raw.filter(col("is_target")), raw, col("text"), dim)
    val onePass = Dsir.lambdaWeightsWithin(raw, col("is_target"), col("text"), dim)
    assert(twoPass.size == onePass.size)
    for (j <- twoPass.indices)
      assert(twoPass(j) == onePass(j), s"bucket $j: ${twoPass(j)} vs ${onePass(j)}")
  }

  test("score equals an independent explode+join recomputation") {
    val docs = Seq((1L, "the cat sat"), (2L, "dogs bark loudly at night"), (3L, ""))
      .toDF("doc_id", "text")
    val lam = (0 until dim).map(j => (j % 7) * 0.1 - 0.3)
    val viaOperator = Dsir.scoreDocuments(docs, col("doc_id"), col("text"), lam)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // independent path: explode the same buckets, join a (bucket, λ) table
    val lamDf = lam.zipWithIndex.map { case (l, j) => (j.toLong, l) }.toDF("b", "l")
    val recomputed = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("__t"))
      .select(col("doc_id"), explode(Dsir.featureBuckets(col("__t"), dim)).as("b"))
      .join(lamDf, Seq("b"))
      .groupBy("doc_id").agg(sum("l").as("lw"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((id, lw) <- recomputed)
      assert(math.abs(viaOperator(id) - lw) < 1e-9, s"doc $id: ${viaOperator(id)} vs $lw")
  }

  test("joined large-dim scoring matches the literal path") {
    val docs = Seq((1L, "the cat sat on the mat"), (2L, "dogs bark"), (3L, ""))
      .toDF("doc_id", "text")
    val lam = (0 until dim).map(j => (j % 11) * 0.01 - 0.05)
    val literal = Dsir.scoreDocuments(docs, col("doc_id"), col("text"), lam)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val joined = Dsir.scoreDocumentsJoined(docs, col("doc_id"), col("text"),
      Dsir.lambdaTable(spark, lam), dim)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(joined.keySet == literal.keySet)
    for ((k, v) <- literal)
      assert(math.abs(joined(k) - v) < 1e-9, s"doc $k: ${joined(k)} vs $v")
  }

  test("bigram features change the score (order sensitivity)") {
    val lam = (0 until dim).map(j => j * 1e-3)
    val scored = Dsir.scoreDocuments(
      Seq((1L, "alpha beta"), (2L, "beta alpha")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), lam)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // same unigrams, different bigram bucket — scores differ
    assert(scored(1L) != scored(2L))
  }

  test("gumbel top-k is deterministic, bounded, and weight-dominated") {
    val scored = (1L to 100L).map(i => (i, if (i <= 5) 1000.0 else -1000.0))
      .toDF("doc_id", "log_weight")
    val pick = Dsir.gumbelTopK(scored, col("doc_id"), col("log_weight"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(pick.size == 10)
    assert((1L to 5L).forall(pick.contains), s"extreme-weight docs must be selected: $pick")
    val again = Dsir.gumbelTopK(scored, col("doc_id"), col("log_weight"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(pick == again)
  }

  test("salt changes the selection among equal weights") {
    val scored = (1L to 200L).map(i => (i, 0.0)).toDF("doc_id", "log_weight")
    val a = Dsir.gumbelTopK(scored, col("doc_id"), col("log_weight"), 20, "a")
      .collect().map(_.getLong(0)).toSet
    val b = Dsir.gumbelTopK(scored, col("doc_id"), col("log_weight"), 20, "b")
      .collect().map(_.getLong(0)).toSet
    assert(a != b)
  }
}
