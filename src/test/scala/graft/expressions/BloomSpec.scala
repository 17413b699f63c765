package graft.expressions

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("bloom agg: no false negatives, false positives near fpp") {
    val inserted = (1 to 1000).map(i => s"doc-$i")
    val bytes = BloomSketch.build(inserted.toDF("v"), col("v"), 1000L, 0.01)
    val probes = (inserted ++ (1 to 10000).map(i => s"other-$i")).toDF("v")
      .select(col("v"), BloomSketch.mightContain(bytes, col("v")).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(inserted.forall(probes), "a bloom filter must never miss an inserted value")
    val fp = (1 to 10000).count(i => probes(s"other-$i"))
    assert(fp < 500, s"false-positive count $fp far above the 1% design point")
  }

  test("per-slice filters union to the global membership state") {
    val a = BloomSketch.build(Seq("x1", "x2").toDF("v"), col("v"), 100L, 0.01)
    val b = BloomSketch.build(Seq("y1").toDF("v"), col("v"), 100L, 0.01)
    val merged = Seq(a, b).toDF("bf")
      .agg(BloomSketch.bloomUnionAgg(col("bf"), 100L, 0.01).as("bf"))
      .head().getAs[Array[Byte]](0)
    for (v <- Seq("x1", "x2", "y1"))
      assert(Seq(v).toDF("v").select(BloomSketch.mightContain(merged, col("v")))
        .head().getBoolean(0), s"$v lost in union")
  }

  test("grouped bloom state: empty-free groups carry valid filters") {
    val rows = Seq(("a", "k1"), ("a", "k2"), ("b", "k3")).toDF("g", "v")
    val filters = rows.groupBy("g")
      .agg(BloomSketch.bloomAgg(col("v"), 10L, 0.01).as("bf"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(Seq("k3").toDF("v")
      .select(BloomSketch.mightContain(filters("b"), col("v"))).head().getBoolean(0))
    assert(!Seq("k1").toDF("v")
      .select(BloomSketch.mightContain(filters("b"), col("v"))).head().getBoolean(0))
  }

  test("broadcast-backed probe matches the task-serialized probe") {
    val inserted = (1 to 500).map(i => s"key-$i")
    val bytes = BloomSketch.build(inserted.toDF("v"), col("v"), 500L, 0.01)
    val bc = spark.sparkContext.broadcast(bytes)
    val probes = (inserted ++ (1 to 500).map(i => s"miss-$i")).toDF("v")
      .select(
        BloomSketch.mightContain(bytes, col("v")).as("direct"),
        BloomSketch.mightContain(bc, col("v")).as("bcast"))
      .collect()
    assert(probes.forall(r => r.getBoolean(0) == r.getBoolean(1)),
      "broadcast probe diverged from the byte-array probe")
  }

  test("two-tier bloom dedup equals the plain anti-join exactly") {
    val corpus = (1L to 200L).map(i => (i, s"known document number $i")).toDF("doc_id", "text")
    val index = Dedup.contentHashIndex(corpus, col("text"))
    val batch = ((150L to 260L).map(i => (i + 1000L, s"known document number $i")) ++
      Seq((5000L, "a wholly novel document")))
      .toDF("doc_id", "text")
    val bloom = Dedup.bloomOfIndex(index, expectedItems = 200L)
    val plain = Dedup.exactDedupAgainst(batch, col("text"), index)
      .select("doc_id").as[Long].collect().toSet
    val tiered = Dedup.exactDedupAgainstBloom(batch, col("text"), index, bloom)
      .select("doc_id").as[Long].collect().toSet
    assert(tiered == plain, s"two-tier diverged: ${tiered.diff(plain)} / ${plain.diff(tiered)}")
    assert(plain.contains(5000L) && !plain.contains(1150L))
  }
}
