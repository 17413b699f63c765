package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SortedNeighborhoodSpec extends SparkSpec {
  import spark.implicits._

  test("neighborPairs: exactly the rank-window pairs, each once") {
    // sort by v: order is id 3 (v=1), 1 (v=2), 2 (v=3), 4 (v=9)
    val df = Seq((1L, 2.0), (2L, 3.0), (3L, 1.0), (4L, 9.0)).toDF("id", "v")
    val got = SortedNeighborhood.neighborPairs(df, col("id"), Seq(col("v")), window = 1)
      .orderBy("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L), (1L, 3L), (2L, 4L)))
    val w2 = SortedNeighborhood.neighborPairs(df, col("id"), Seq(col("v")), window = 2)
      .as[(Long, Long)].collect().toSeq
    assert(w2.length === 2 + 2 + 1 && w2.distinct.length === w2.length)
  }

  test("neighborPairs: ties get distinct ranks via the id tie-break (no pair explosion)") {
    val df = spark.range(100).select(col("id"), lit(1.0).as("v")) // all-tied key
    val n = SortedNeighborhood.neighborPairs(df, col("id"), Seq(col("v")), window = 3).count()
    assert(n === 3 * 100 - (1 + 2 + 3)) // exactly n*w minus the tail truncation
  }

  test("nearDupPairs: finds length-adjacent near-dups, misses far-apart ones") {
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "the quick brown fox jumps over the lazy dog again and once"
    val far = "completely different words having nothing in common with those sentences here"
    // doc 3's length sits between 1 and 2 → window 1 still pairs (1,2)? No:
    // lengths: a=60, b=59, far=78 — (1,2) adjacent, far at the end
    val df = Seq((1L, a), (2L, b), (3L, far)).toDF("doc_id", "text")
    val got = SortedNeighborhood.nearDupPairs(df, col("doc_id"), col("text"),
        Seq(length(col("text"))), window = 1, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L)))
  }

  test("empty input and window larger than the table are safe") {
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    assert(SortedNeighborhood.neighborPairs(empty, col("id"), Seq(col("v")), 5).count() === 0)
    val tiny = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
    assert(SortedNeighborhood.neighborPairs(tiny, col("id"), Seq(col("v")), 50).count() === 1)
  }
}
