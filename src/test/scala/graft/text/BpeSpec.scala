package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "low low low lower lowest"),
    (2L, "new newer newest low"),
    (3L, "  LOW  newer ")) // normalization folds into the same words
    .toDF("doc_id", "text")

  test("wordCounts aggregates normalized word frequencies") {
    val wc = Bpe.wordCounts(docs, col("text")).as[(String, Long)].collect().toMap
    assert(wc("low") == 5L)
    assert(wc("newer") == 2L)
    assert(wc("lowest") == 1L)
  }

  test("charPairs emits adjacent 2-char substrings, leftmost first") {
    val out = spark.range(1).select(Bpe.charPairs(lit("abca")).as("p"))
      .as[Seq[String]].head()
    assert(out == Seq("ab", "bc", "ca"))
    val short = spark.range(1).select(Bpe.charPairs(lit("x")).as("p"))
      .as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("topPairs matches a hand-computed corpus count") {
    // "low"×5, "lower"×2... recompute naively from the same normalization
    val words = docs.select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .as[String].collect().filter(_.nonEmpty)
    val naive = words.flatMap(w => w.sliding(2).filter(_.length == 2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Bpe.topPairs(docs, col("text"), 100)
      .as[(String, Long)].collect().toMap
    assert(got == naive)
  }

  test("mergeSymbols is greedy leftmost and non-overlapping") {
    def merge(syms: Seq[String], a: String, b: String): Seq[String] =
      spark.range(1)
        .select(Bpe.mergeSymbols(typedLit(syms), a, b).as("m"))
        .as[Seq[String]].head()
    assert(merge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(merge(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(merge(Seq("l", "o", "w"), "l", "o") == Seq("lo", "w"))
    assert(merge(Seq("x"), "a", "b") == Seq("x"))
    assert(merge(Seq.empty[String], "a", "b") == Seq.empty)
    // merged symbol does not cascade within the same round
    assert(merge(Seq("a", "b", "b"), "a", "b") == Seq("ab", "b"))
  }

  test("trainMerges matches a naive in-memory BPE reference") {
    // naive reference implementation over the same normalized words
    def naiveTrain(words: Map[String, Long], n: Int): Seq[(String, String, Long)] = {
      var vocab: Map[Seq[String], Long] =
        words.groupBy(_._1.map(_.toString): Seq[String]).view.mapValues(_.values.sum).toMap
      val out = Seq.newBuilder[(String, String, Long)]
      for (_ <- 0 until n) {
        val counts = vocab.toSeq.flatMap { case (syms, c) =>
          syms.sliding(2).filter(_.size == 2).map(p => ((p(0), p(1)), c))
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        if (counts.nonEmpty) {
          val ((a, b), c) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
          out += ((a, b, c))
          vocab = vocab.toSeq.map { case (syms, wc) =>
            val merged = Seq.newBuilder[String]
            var i = 0
            while (i < syms.size) {
              if (i + 1 < syms.size && syms(i) == a && syms(i + 1) == b) {
                merged += (a + b); i += 2
              } else { merged += syms(i); i += 1 }
            }
            (merged.result(), wc)
          }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        }
      }
      out.result()
    }
    val words = Bpe.wordCounts(docs, col("text")).as[(String, Long)].collect().toMap
    val expect = naiveTrain(words, 6)
    val got = Bpe.trainMerges(docs, col("text"), 6)
    assert(got == expect)
  }

  test("encode applies ordered merges per word, preserving token order") {
    val d = Seq((1L, "abab cab"), (2L, "abc")).toDF("doc_id", "text")
    // merge order matters: (a,b)→ab first, then (ab,ab)→abab
    val out = Bpe.encode(d, col("doc_id"), col("text"),
        Seq(("a", "b"), ("ab", "ab")))
      .orderBy("doc_id")
      .select("bpe_tokens", "n_bpe_tokens")
      .as[(Seq[String], Long)].collect().toSeq
    assert(out == Seq(
      (Seq("abab", "c", "ab"), 3L),   // "abab"→[abab], "cab"→[c, ab]
      (Seq("ab", "c"), 2L)))          // "abc"→[ab, c]
  }

  test("encode round-trips: units concatenate back to the normalized words") {
    val merges = Bpe.trainMerges(docs, col("text"), 5).map(m => (m._1, m._2))
    val enc = Bpe.encode(docs, col("doc_id"), col("text"), merges, mergesPerStage = 2)
      .select("doc_id", "bpe_tokens").as[(Long, Seq[String])].collect().toMap
    // reconstruct each doc's concatenated text from its subword units and
    // compare against the same normalization the encoder consumed
    val expected = docs
      .select(col("doc_id"), concat_ws("", TextFunctions.tokens(col("text"))).as("t"))
      .as[(Long, String)].collect().toMap
    enc.foreach { case (id, units) =>
      assert(units.mkString("") == expected(id), s"doc $id lost characters")
    }
    // the trained merges actually compress: fewer units than characters
    assert(enc(1L).size < expected(1L).length)
  }

  test("encode with zero merges is character splitting") {
    val d = Seq((1L, "hi yo")).toDF("doc_id", "text")
    val out = Bpe.encode(d, col("doc_id"), col("text"), Seq.empty)
      .select("bpe_tokens").as[Seq[String]].head()
    assert(out == Seq("h", "i", "y", "o"))
  }
}
