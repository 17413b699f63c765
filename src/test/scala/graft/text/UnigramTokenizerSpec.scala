package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramTokenizerSpec extends SparkSpec {
  import spark.implicits._

  // a corpus where "hello" and "world" dominate — a good tokenizer
  // must learn them as whole pieces
  private def corpus = (1 to 50).map(i => (i.toLong, "hello world hello world hello"))
    .toDF("doc_id", "text")

  test("seedVocab contains every single char and the heavy substrings") {
    val seed = seedVocab()
    assert(seed.contains("h") && seed.contains("o") && seed.contains("w"))
    assert(seed.contains("hello") && seed.contains("world"))
    // single chars are forced in even when multis dominate by weight
    val singles = seed.keys.filter(_.length == 1).toSet
    assert(singles == "helowrd".toSet.map((c: Char) => c.toString))
  }

  private def seedVocab(): Map[String, Long] =
    UnigramTokenizer.seedVocab(corpus, col("text"), maxPieceLen = 5, seedSize = 40)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("train learns the dominant words as whole pieces") {
    val model = UnigramTokenizer.train(corpus, col("text"),
      vocabSize = 20, maxPieceLen = 5, iters = 3)
    assert(model.pieces.contains("hello"), s"vocab was ${model.pieces.keys.toSeq.sorted}")
    assert(model.pieces.contains("world"))
    // whole-word pieces must out-score their spelled-out forms
    val seg = Seq("helloworld").toDF("w")
      .select(model.segment(col("w"))).as[Seq[String]].collect().head
    assert(seg == Seq("hello", "world"), s"got $seg")
  }

  test("segmentation always round-trips, unknown chars ride as singles") {
    val model = UnigramTokenizer.train(corpus, col("text"),
      vocabSize = 15, maxPieceLen = 5, iters = 2)
    val words = Seq("hello", "help", "zq7", "xhellox", "")
    val segs = words.toDF("w")
      .select(col("w"), model.segment(col("w")).as("p"))
      .as[(String, Seq[String])].collect().toMap
    words.foreach { w =>
      assert(segs(w).mkString == w, s"round-trip broke for '$w': ${segs(w)}")
    }
    assert(segs("zq7").forall(_.length == 1), "unknown chars segment as singles")
    assert(segs("").isEmpty)
  }

  test("training is deterministic") {
    val m1 = UnigramTokenizer.train(corpus, col("text"), vocabSize = 20, iters = 2)
    val m2 = UnigramTokenizer.train(corpus, col("text"), vocabSize = 20, iters = 2)
    assert(m1.pieces == m2.pieces)
  }

  test("encode compresses the corpus well below character count") {
    val model = UnigramTokenizer.train(corpus, col("text"),
      vocabSize = 20, maxPieceLen = 5, iters = 3)
    val out = UnigramTokenizer.encode(corpus, col("doc_id"), col("text"), model)
    val row = out.orderBy("doc_id").select("pieces", "n_pieces").collect().head
    assert(row.getSeq[String](0) == Seq("hello", "world", "hello", "world", "hello"))
    assert(row.getLong(1) == 5, "23 chars → 5 pieces")
    assert(out.count() == 50)
  }

  test("ties prefer the longer piece deterministically") {
    val model = UnigramTokenizer.Model(
      Map("ab" -> math.log(0.25), "a" -> math.log(0.5), "b" -> math.log(0.5)),
      maxPieceLen = 2, unkLogp = -100.0)
    // "ab" via piece 'ab' scores log .25; via 'a'+'b' scores log .25 too
    val seg = Seq("ab").toDF("w").select(model.segment(col("w")))
      .as[Seq[String]].collect().head
    assert(seg == Seq("ab"))
  }
}
