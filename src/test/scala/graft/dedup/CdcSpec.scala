package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random text — varied enough to hit boundaries
  private def synth(seed: Int, n: Int): String = {
    val sb = new StringBuilder
    var x = seed.toLong
    while (sb.length < n) {
      x = (x * 6364136223846793005L + 1442695040888963407L)
      sb.append(('a' + ((x >>> 33) % 26)).toChar)
    }
    sb.toString
  }

  test("cdcChunks partitions each doc exactly: reassembly is the identity") {
    val docs = Seq((1L, synth(1, 2000)), (2L, synth(2, 500)), (3L, "tiny"),
      (4L, synth(4, 3000))).toDF("doc_id", "text")
    val chunks = Cdc.cdcChunks(docs, col("doc_id"), col("text"),
        window = 8, marker = "0") // P=1/16 → expected 16-char chunks
      .orderBy("id", "offset")
      .as[(Long, Long, Long, String)].collect()
    val texts = docs.as[(Long, String)].collect().toMap
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc.keySet == texts.keySet)
    for ((id, cs) <- byDoc) {
      // offsets tile [1, len] with no gaps or overlaps
      var pos = 1L
      for ((_, off, len, h) <- cs.sortBy(_._2)) {
        assert(off == pos, s"doc $id: chunk at $off, expected $pos")
        assert(h == java.security.MessageDigest.getInstance("MD5")
          .digest(texts(id).substring(off.toInt - 1, (off + len - 1).toInt)
            .getBytes("UTF-8")).map("%02x".format(_)).mkString)
        pos += len
      }
      assert(pos == texts(id).length + 1, s"doc $id: tiled ${pos - 1} of ${texts(id).length}")
    }
    assert(byDoc(1L).length > 10, "a 2000-char doc should split into many chunks")
    assert(byDoc(3L).length == 1, "a doc shorter than the window is one chunk")
  }

  test("cdcChunks boundaries re-align after an insertion (the CDC property)") {
    val s = synth(7, 4000)
    val edited = "XYZ" + s // shift every character by 3
    val docs = Seq((1L, s), (2L, edited)).toDF("doc_id", "text")
    val chunks = Cdc.cdcChunks(docs, col("doc_id"), col("text"),
        window = 8, marker = "0")
      .select("id", "chunk_hash").as[(Long, String)].collect()
    val h1 = chunks.filter(_._1 == 1L).map(_._2).toSet
    val h2 = chunks.filter(_._1 == 2L).map(_._2).toSet
    val shared = h1.intersect(h2).size
    // fixed-size blocking would share ZERO blocks after a 3-char shift;
    // CDC re-aligns at the first boundary after the edit
    assert(shared >= (h1.size * 3) / 4,
      s"expected most chunks shared after a prefix edit, got $shared of ${h1.size}")
  }

  test("changeRatio classifies revisions and counts shared bytes at multiplicity") {
    val s1 = synth(11, 3000)
    val before = Seq((1L, s1), (2L, "stable doc"), (3L, "going away"),
      (5L, "xx" * 6)).toDF("doc_id", "text")
    val after = Seq((1L, s1 + " APPENDED TAIL"), (2L, "stable doc"),
      (4L, "brand new"), (5L, "xx" * 6)).toDF("doc_id", "text")
    val got = Cdc.changeRatio(
        Cdc.cdcChunks(before, col("doc_id"), col("text"), window = 8, marker = "0"),
        Cdc.cdcChunks(after, col("doc_id"), col("text"), window = 8, marker = "0"))
      .select("id", "status", "change_ratio")
      .as[(Long, String, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(2L) == (("unchanged", Some(0.0))))
    assert(got(5L) == (("unchanged", Some(0.0))))
    assert(got(3L)._1 == "deleted" && got(3L)._2.isEmpty)
    assert(got(4L) == (("added", Some(1.0))))
    val (st1, r1) = got(1L)
    assert(st1 == "changed" && r1.get > 0.0 && r1.get < 0.2,
      s"append-only edit must share almost everything, got $r1") // CDC re-alignment
  }

  test("changeRatio: repeated chunks share at min multiplicity") {
    // one doc whose text is the same chunkable unit repeated: before 1×,
    // after 3× — shared must count the unit ONCE, not three times
    val unit = synth(13, 400)
    val before = Seq((1L, unit)).toDF("doc_id", "text")
    val after = Seq((1L, unit + unit + unit)).toDF("doc_id", "text")
    val ca = Cdc.cdcChunks(before, col("doc_id"), col("text"), window = 8, marker = "0")
    val cb = Cdc.cdcChunks(after, col("doc_id"), col("text"), window = 8, marker = "0")
    val r = Cdc.changeRatio(ca, cb)
      .select("total_before", "total_after", "shared_chars")
      .as[(Long, Long, Long)].collect().head
    assert(r._1 == 400L && r._2 == 1200L)
    // shared is capped by the BEFORE multiplicity: at most the whole
    // before doc, and at least the interior chunks that tile identically
    assert(r._3 <= 400L && r._3 > 0L, s"shared=${r._3}")
  }

  test("cdcChunks: null/empty text contribute nothing; dedupRatio arithmetic") {
    val docs = Seq((1L, Some("aaaa")), (2L, Some("aaaa")), (3L, None),
      (4L, Some(""))).toDF("doc_id", "text")
    val chunks = Cdc.cdcChunks(docs, col("doc_id"), col("text"), window = 8)
    assert(chunks.select("id").distinct().as[Long].collect().toSet == Set(1L, 2L))
    val r = Cdc.dedupRatio(chunks).as[(Long, Long, Double)].collect().head
    assert(r == ((8L, 4L, 0.5))) // two identical 4-char docs → half saved
    intercept[IllegalArgumentException] {
      Cdc.cdcChunks(docs, col("doc_id"), col("text"), marker = "ZZ")
    }
    intercept[IllegalArgumentException] {
      Cdc.cdcChunks(docs, col("doc_id"), col("text"), window = 1)
    }
  }
}
