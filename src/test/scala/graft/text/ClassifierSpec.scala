package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("featureIndex is md5-derived, stable, and in [0, dim)") {
    val idx = spark.createDataset(Seq("the", "quick", "fox", "the"))
      .select(Classifier.featureIndex(col("value"), 16).as("i"))
      .as[Long].collect()
    assert(idx.forall(i => i >= 0 && i < 16))
    assert(idx(0) == idx(3)) // same token, same bucket
    // pinned value: first 15 hex of md5("the") = "8fc42c6ddf9966d" mod 16
    val expected = java.lang.Long.parseLong("8fc42c6ddf9966d", 16) % 16
    assert(idx(0) == expected)
  }

  test("linearScore averages bucket weights through a sigmoid") {
    val dim = 4
    // place every token's weight by its real bucket
    val toks = Seq("aa", "bb", "cc")
    val buckets = spark.createDataset(toks)
      .select(Classifier.featureIndex(col("value"), dim).as("i")).as[Long].collect()
    val weights = (0 until dim).map(j => buckets.count(_ == j) * 1.0) // w[b]=freq of b
    val expectedMean = toks.indices.map(i => weights(buckets(i).toInt)).sum / 3.0
    val expected = 1.0 / (1.0 + math.exp(-(0.5 + expectedMean)))
    val got = Seq((1L, toks.mkString(" "))).toDF("id", "text")
      .select(TextFunctions.tokens(col("text")).as("t"))
      .select(Classifier.linearScore(col("t"), weights, 0.5).as("s"))
      .as[Double].head()
    assert(math.abs(got - expected) < 1e-12)
  }

  test("empty document scores sigmoid(bias)") {
    val got = Seq((1L, "")).toDF("id", "text")
      .select(TextFunctions.tokens(col("text")).as("t"))
      .select(Classifier.linearScore(col("t"), Seq(9.0, 9.0), -1.0).as("s"))
      .as[Double].head()
    // normalize("") tokenizes to [""], which hashes into a bucket — but
    // with equal weights the mean is 9.0 regardless; the guard we want
    // is simply "no crash, score in (0,1)"
    assert(got > 0 && got < 1)
  }

  test("trainLogistic separates a hash-separable corpus and improves loss") {
    // two disjoint vocabularies → disjoint bucket sets at dim=64 with
    // high probability; verify separation actually holds for this seed
    val pos = Seq("excellent insightful thorough prose", "insightful thorough excellent analysis")
    val neg = Seq("buy cheap pills now", "cheap pills buy discount")
    val df = (pos.map((_, 1.0)) ++ neg.map((_, 0.0))).zipWithIndex
      .map { case ((t, y), i) => (i.toLong, t, y) }.toDF("id", "text", "y")
    val (w, b) = Classifier.trainLogistic(df, col("text"), col("y"), dim = 64, rounds = 50, lr = 2.0)
    val scored = Classifier.scoreDocuments(df, col("id"), col("text"), w, b)
      .join(df.select("id", "y"), col("doc_id") === col("id"))
      .select("score", "y").as[(Double, Double)].collect()
    assert(scored.length == 4)
    assert(scored.forall { case (s, y) => (s > 0.5) == (y > 0.5) },
      s"not separated: ${scored.mkString(", ")}")
  }
}
