package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry durian"),
    (4L, "")
  ).toDF("doc_id", "text")

  /** Plain-Scala BM25 over the same corpus — the ground truth. */
  private def naive(query: Seq[String], k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    val corpus = Map(
      1L -> Seq("apple", "banana", "apple"),
      2L -> Seq("banana", "cherry"),
      3L -> Seq("cherry", "cherry", "cherry", "durian"),
      4L -> Seq.empty[String])
    val n = corpus.size
    val avgdl = corpus.values.map(_.size).sum.toDouble / n
    val dfT = corpus.values.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size).toMap
    corpus.flatMap { case (id, toks) =>
      val score = query.distinct.collect {
        case t if toks.contains(t) =>
          val tf = toks.count(_ == t).toDouble
          val idf = math.log(1.0 + (n - dfT(t) + 0.5) / (dfT(t) + 0.5))
          idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * toks.size / avgdl))
      }.sum
      if (score > 0) Some(id -> score) else None
    }
  }

  test("retrieve matches a hand-rolled BM25 incl. dl normalization and idf") {
    val qs = Seq((10L, "cherry banana")).toDF("query_id", "query_text")
    val got = Bm25.retrieve(docs, col("doc_id"), col("text"), qs, k = 10)
      .select(col("doc_id"), col("score")).as[(Long, Double)].collect().toMap
    val expect = naive(Seq("cherry", "banana"))
    assert(got.keySet == expect.keySet)
    expect.foreach { case (id, s) =>
      assert(math.abs(got(id) - math.rint(s * 1e4) / 1e4) < 1.5e-4, s"doc $id: ${got(id)} vs $s")
    }
  }

  test("rank is dense 1..k by (score desc, doc_id asc) and k caps output") {
    val qs = Seq((1L, "cherry")).toDF("query_id", "query_text")
    val rows = Bm25.retrieve(docs, col("doc_id"), col("text"), qs, k = 1).collect()
    assert(rows.length == 1)
    // doc 3 has tf=3 but is longer; doc 2 tf=1 and shorter — the dl
    // normalization decides; naive() is the referee
    val best = naive(Seq("cherry")).maxBy { case (id, s) => (s, -id) }._1
    assert(rows.head.getAs[Long]("doc_id") == best)
    assert(rows.head.getAs[Long]("rank") == 1L)
  }

  test("repeated query terms do not double-count; no-hit queries are absent") {
    val qs = Seq((1L, "cherry cherry cherry"), (2L, "zzz absent")).toDF("query_id", "query_text")
    val out = Bm25.retrieve(docs, col("doc_id"), col("text"), qs, k = 10)
    val byQ = out.collect().groupBy(_.getAs[Long]("query_id"))
    assert(!byQ.contains(2L))
    val single = Bm25.retrieve(docs, col("doc_id"), col("text"),
      Seq((1L, "cherry")).toDF("query_id", "query_text"), k = 10)
    assert(byQ(1L).map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSet ==
      single.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSet)
  }

  test("empty documents count toward N and avgdl but never match") {
    val qs = Seq((1L, "banana")).toDF("query_id", "query_text")
    val ids = Bm25.retrieve(docs, col("doc_id"), col("text"), qs, k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L))
  }
}
