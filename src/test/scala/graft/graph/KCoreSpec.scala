package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def naiveKCore(edges: Set[(Long, Long)], k: Int): Map[Long, Int] = {
    var e = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
    var changed = true
    while (changed) {
      val deg = (e.toSeq.map(_._1) ++ e.toSeq.map(_._2))
        .groupBy(identity).map { case (v, o) => v -> o.size }
      val bad = deg.filter(_._2 < k).keySet
      val pruned = e.filter(p => !bad(p._1) && !bad(p._2))
      changed = pruned != e
      e = pruned
    }
    (e.toSeq.map(_._1) ++ e.toSeq.map(_._2))
      .groupBy(identity).map { case (v, o) => v -> o.size }
  }

  test("kCore: K4 with a pendant — 3-core is the clique, 2-core keeps it too") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L)).toDF("s", "d")
    val core3 = KCore.kCore(edges, col("s"), col("d"), 3)
      .as[(Long, Long)].collect().toMap
    assert(core3 == Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 3))
    val core2 = KCore.kCore(edges, col("s"), col("d"), 2)
      .as[(Long, Long)].collect().toMap
    assert(core2.keySet == Set(1L, 2L, 3L, 4L), "the pendant peels, the clique stays")
  }

  test("kCore: a path has no 2-core, a cycle IS its 2-core") {
    val path = (1L to 5L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("s", "d")
    assert(KCore.kCore(path, col("s"), col("d"), 2).count() == 0L)
    val cycle = ((1L to 5L).sliding(2).map(s => (s(0), s(1))).toSeq :+ ((5L, 1L)))
      .toDF("s", "d")
    val got = KCore.kCore(cycle, col("s"), col("d"), 2).as[(Long, Long)].collect().toMap
    assert(got == (1L to 5L).map(_ -> 2).toMap)
  }

  test("kCore equals the naive peel on a seeded random graph, dups/loops collapse") {
    val rnd = new scala.util.Random(7)
    val raw = Seq.fill(220)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    // feed dirty edges: self-loops, duplicates, both orientations
    val dirty = raw ++ raw.map(_.swap) ++ Seq((3L, 3L), (4L, 4L))
    val df = dirty.toDF("s", "d")
    for (k <- Seq(2, 3, 4)) {
      val got = KCore.kCore(df, col("s"), col("d"), k).as[(Long, Long)].collect().toMap
      val want = naiveKCore(raw.toSet, k).map { case (v, d) => v -> d.toLong }
      assert(got == want, s"k=$k")
    }
  }

  test("kCore: maxRounds is a loud contract; bad args rejected") {
    val longPath = (1L to 40L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("s", "d")
    intercept[IllegalStateException] {
      KCore.kCore(longPath, col("s"), col("d"), 2, maxRounds = 3)
    }
    intercept[IllegalArgumentException] {
      KCore.kCore(longPath, col("s"), col("d"), 0)
    }
  }
}
