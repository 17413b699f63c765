package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "  The   quick brown fox jumps over the lazy DOG  ".toLowerCase), // same after normalize
    (3L, "a completely different document about spark engines and shuffles"),
    (4L, "the quick brown fox jumps over the lazy cat")) // near-dup of 1
    .toDF("doc_id", "text")

  test("exactGroups groups by normalized content, keeps min id") {
    val g = Dedup.exactGroups(docs, col("doc_id"), col("text"))
    assert(g.count() == 3)
    val dup = g.filter(col("n_dups") === 2).head()
    assert(dup.getLong(1) == 1L) // keep_id is the min
  }

  test("exactDedup keeps one row per content group") {
    val kept = Dedup.exactDedup(docs, col("doc_id"), col("text"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L))
  }

  test("identical documents collide in every MinHash band") {
    val pairs = Dedup.minHashCandidates(docs, col("doc_id"), col("text"),
      numHashes = 32, numBands = 8).collect()
    val exact = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(exact.isDefined && exact.get.getLong(2) == 8L)
  }

  test("near-duplicates collide in at least one band; unrelated docs do not") {
    val pairs = Dedup.minHashCandidates(docs, col("doc_id"), col("text"),
      numHashes = 32, numBands = 16) // r=2: sensitive bands for the near-dup
    val byPair = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(byPair.contains((1L, 4L)))
    assert(!byPair.exists { case (a, b) => b == 3L || a == 3L })
  }

  test("simHashPairs: identical docs at hamming 0; unrelated docs absent") {
    val pairs = Dedup.simHashPairs(docs, col("doc_id"), col("text"), maxHamming = 3, chunks = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs((1L, 2L)) == 0L)
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("jaccardPairs computes the exact shingle Jaccard") {
    // doc1/doc4: 7 shingles each, 6 shared → J = 6/8 = 0.75
    val pairs = Dedup.jaccardPairs(docs, col("doc_id"), col("text"), threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs((1L, 4L)) == 0.75)
    assert(!pairs.contains((1L, 3L)))
  }
}
