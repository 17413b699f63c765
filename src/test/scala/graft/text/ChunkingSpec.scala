package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunkDocuments windows with overlap, clamps the tail, keeps short docs whole") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b c"),                                  // shorter than one chunk
      (3L, "")                                        // empty → no chunks
    ).toDF("doc_id", "text")
    val out = Chunking.chunkDocuments(docs, col("doc_id"), col("text"),
        chunkTokens = 4, overlapTokens = 2)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "n_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    // doc 1: stride 2 → ceil((10-2)/2) = 4 chunks; last clamps to [t7..t10]
    assert(out.filter(_._1 == 1L).map(_._4) == Seq(
      "t1 t2 t3 t4", "t3 t4 t5 t6", "t5 t6 t7 t8", "t7 t8 t9 t10"))
    // consecutive chunks share exactly the 2-token overlap
    assert(out.filter(_._1 == 1L).forall(_._3 == 4L))
    assert(out.filter(_._1 == 2L) == Seq((2L, 0L, 3L, "a b c")))
    assert(!out.exists(_._1 == 3L))
  }

  test("every token is covered and order is preserved") {
    val docs = Seq((1L, (1 to 23).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = Chunking.chunkDocuments(docs, col("doc_id"), col("text"), 8, 3)
      .orderBy("chunk_id").select("chunk_text").as[String].collect()
    val reassembled = chunks.zipWithIndex.flatMap { case (c, i) =>
      val toks = c.split(" ")
      if (i == 0) toks else toks.drop(3) // drop each chunk's overlap prefix
    }
    assert(reassembled.toSeq == (1 to 23).map(i => s"w$i"))
  }
}
