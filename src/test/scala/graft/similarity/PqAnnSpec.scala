package graft.similarity

import graft.SparkSpec
import graft.vectors.{Pq, VectorOps}
import org.apache.spark.sql.functions._

class PqAnnSpec extends SparkSpec {
  import spark.implicits._

  // unit-normalized real embeddings so squared-L2 ranking ≡ cosine
  // ranking (d² = 2 − 2cos) and the brute-force comparison is exact
  private lazy val emb = {
    val raw = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val v = VectorOps.toDouble(col("embedding"))
    raw.select(col("vec_id"),
      transform(v, x => x / VectorOps.l2Norm(v)).as("embedding"))
      .cache()
  }
  private lazy val queries = emb.filter(col("vec_id") < 10)
  private lazy val pq = Pq.train(emb, "vec_id", "embedding", dim = 64, m = 8, kCodes = 16, rounds = 2)

  private lazy val exactTop5: Set[(Long, Long)] =
    Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet

  private def pqTop5(nProbe: Int, rerank: Int): Set[(Long, Long)] =
    Ann.ivfPqTopK(emb, queries, "vec_id", "embedding", k = 5,
        nLists = 8, nProbe = nProbe, pq = pq, rerank = rerank)
      .select("qid", "cid").as[(Long, Long)].collect().toSet

  private def recall(s: Set[(Long, Long)]): Double =
    exactTop5.intersect(s).size.toDouble / exactTop5.size

  test("full probe + complete exact rerank reduces to brute force") {
    // rerank spanning every candidate makes stage 2 an exact search
    // over the full corpus — the plumbing identity (tie rules included)
    assert(pqTop5(nProbe = 8, rerank = 499) == exactTop5)
  }

  test("ADC-only ranking carries real signal; rerank widens recall monotonically") {
    // the synthetic embeddings are near-isotropic — PQ's worst case
    // (no subspace structure to exploit), so the floor is modest; the
    // random-guess baseline is 5/499 ≈ 0.01 and ADC holds ~15×, which
    // is the signal the rerank stage then repairs
    val adcOnly = recall(pqTop5(nProbe = 8, rerank = 0))
    info(s"ADC-only recall@5 = $adcOnly")
    assert(adcOnly >= 0.1, s"ADC-only recall collapsed: $adcOnly")
    // under COMPLETE rerank the candidate pool only grows with nProbe,
    // and a globally-top-5 candidate can never leave the pool's top-5 —
    // recall is provably monotone in nProbe
    val r2 = recall(pqTop5(nProbe = 2, rerank = 499))
    val r8 = recall(pqTop5(nProbe = 8, rerank = 499))
    info(s"recall@5: nProbe=2 → $r2, nProbe=8 → $r8")
    assert(r2 <= r8 + 1e-9, s"recall not monotone: $r2 vs $r8")
    assert(r8 == 1.0)
    // bounded rerank between the two regimes keeps the output well-formed
    val rows = Ann.ivfPqTopK(emb, queries, "vec_id", "embedding", k = 5,
        nLists = 8, nProbe = 8, pq = pq, rerank = 40)
      .groupBy("qid").agg(count(lit(1)).as("n"), min("rank").as("lo"), max("rank").as("hi"))
      .select("n", "lo", "hi").as[(Long, Long, Long)].collect()
    assert(rows.length == 10 && rows.forall(_ == ((5L, 1L, 5L))))
  }

  test("rerank < k is rejected") {
    intercept[IllegalArgumentException] {
      Ann.ivfPqTopK(emb, queries, "vec_id", "embedding", k = 5,
        nLists = 8, nProbe = 2, pq = pq, rerank = 3)
    }
  }
}
