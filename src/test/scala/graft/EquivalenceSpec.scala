package graft

import graft.dedup.Dedup
import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Randomized equivalence net: each non-trivial operator is compared on
  * seeded pseudo-random inputs against a naive in-memory reference
  * implementation. Fixed seeds keep CI deterministic while the inputs
  * exercise combinations no hand-written example covers (bin-boundary
  * points, tied timestamps, pigeonhole edge distances).
  */
class EquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("rangeJoin equals the naive containment filter on random data") {
    val points = Seq.fill(300)(rnd.nextInt(2000).toLong)
    val ranges = Seq.tabulate(40) { i =>
      val s = rnd.nextInt(2000).toLong
      (i.toLong, s, s + rnd.nextInt(300).toLong - 20) // some inverted
    }
    for (binWidth <- Seq(1L, 7L, 64L, 5000L)) {
      val got = Relational.rangeJoin(
          points.toDF("p"), ranges.toDF("rid", "s", "e"),
          col("p"), col("s"), col("e"), binWidth)
        .select("rid", "p").as[(Long, Long)].collect()
      val expected = for { p <- points; (rid, s, e) <- ranges if p >= s && p <= e } yield (rid, p)
      assert(got.sorted.toSeq == expected.sorted.toSeq, s"binWidth=$binWidth")
    }
  }

  test("asOfJoin equals the naive latest-at-or-before scan on random data (with ties)") {
    // small ts domain forces duplicate timestamps across and within sides
    val left = Seq.tabulate(200)(i => (i.toLong, rnd.nextInt(6).toLong, rnd.nextInt(50).toLong))
    val right = Seq.tabulate(80)(i => (rnd.nextInt(6).toLong, rnd.nextInt(50).toLong, i.toLong))
    val got = Relational.asOfJoin(
        left.toDF("lid", "k", "ts"),
        right.toDF("k", "ts", "rv"),
        key = "k", ts = "ts", rightVals = Seq("rv"))
      .select("lid", "asof_rv").as[(Long, Option[Long])].collect().toMap
    left.foreach { case (lid, k, ts) =>
      val candidates = right.filter(r => r._1 == k && r._2 <= ts)
      if (candidates.isEmpty) assert(got(lid).isEmpty, s"left row $lid expected no match")
      else {
        // asOfJoin's documented contract: right rows unique per (key, ts),
        // else the carried value is ill-defined — this random input
        // violates it deliberately, so accept any row at the max ts
        val maxTs = candidates.map(_._2).max
        val admissible = candidates.filter(_._2 == maxTs).map(_._3).toSet
        assert(got(lid).exists(admissible), s"left row $lid (k=$k, ts=$ts): ${got(lid)} not in $admissible")
      }
    }
  }

  test("simHashPairs emits EVERY pair within the Hamming bound (pigeonhole completeness)") {
    // random word soup with heavy vocabulary overlap → many near-dup signatures
    def doc(): String = Seq.fill(8)(s"w${rnd.nextInt(12)}").mkString(" ")
    val docs = Seq.tabulate(120)(i => (i.toLong, doc())).toDF("doc_id", "text")
    val sigs = Dedup.simHashSignatures(docs, col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toMap
    val expected = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= 3
    } yield (a, b, h.toLong)).toSet
    val got = Dedup.simHashPairs(docs, col("doc_id"), col("text"), maxHamming = 3, chunks = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
    assert(expected.nonEmpty, "degenerate corpus — no near pairs generated")
  }

  test("jaccardPairs(NoDfCap) equals the naive set Jaccard on random data") {
    def doc(): String = Seq.fill(6 + rnd.nextInt(6))(s"t${rnd.nextInt(9)}").mkString(" ")
    val rows = Seq.tabulate(60)(i => (i.toLong, doc()))
    val got = Dedup.jaccardPairs(rows.toDF("doc_id", "text"), col("doc_id"), col("text"),
        threshold = 0.3, k = 3, maxDf = Dedup.NoDfCap)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    def shingleSet(t: String): Set[String] =
      t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val expected = (for {
      (a, ta) <- rows; (b, tb) <- rows if a < b
      sa = shingleSet(ta); sb = shingleSet(tb)
      inter = (sa & sb).size if inter > 0
      j = inter.toDouble / (sa.size + sb.size - inter) if j >= 0.3
    } yield (a, b)).toSet
    assert(got == expected)
    assert(expected.nonEmpty)
  }

  test("packSequences: packs are contiguous, budget-bounded, and partition the corpus") {
    import graft.operators.Packing
    val docs = Seq.tabulate(200)(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(40))("w").mkString(" "))).toDF("doc_id", "text")
    val budget = 100L
    val packed = Packing.packSequences(docs, col("doc_id"), col("text"), budget, nShards = 4)
      .select("doc_id", "shard", "pack_id", "n_tokens").as[(Long, Long, Long, Long)].collect()
    assert(packed.length == 200) // every document in exactly one pack
    packed.groupBy(r => (r._2, r._3)).foreach { case ((shard, pack), rows) =>
      val tokens = rows.map(_._4).sum
      // a pack may exceed budget only by its LAST document (greedy
      // prefix-sum packing: a doc starts a new pack when the budget is
      // already consumed, so all but one doc fit within budget)
      assert(tokens - rows.map(_._4).max < budget, s"pack ($shard,$pack) over-packed: $tokens")
    }
    // contiguity: within a shard, pack_id is non-decreasing in doc_id
    packed.groupBy(_._2).foreach { case (_, rows) =>
      val byDoc = rows.sortBy(_._1).map(_._3)
      assert(byDoc.zip(byDoc.drop(1)).forall { case (a, b) => a <= b })
    }
  }

  test("Scd.fromChangeLog equals the naive interval derivation on random data") {
    import graft.etl.Scd
    // 8 keys × small state alphabet → long runs of repeats to collapse;
    // unique (key, ts) pairs (the applyUpdates contract)
    val obs = rnd.shuffle(
      (for { k <- 0L until 8L; ts <- 0L until 40L } yield (k, ts)).toSeq)
      .take(180)
      .map { case (k, ts) => (k, ts, s"s${rnd.nextInt(3)}") }
    val got = Scd.fromChangeLog(obs.toDF("k", "ts", "st"), Seq("k"), Seq("st"), "ts")
      .select("k", "st", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq.sorted
    val expected = obs.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
      val sorted = rows.sortBy(_._2)
      val changes = sorted.zip(None +: sorted.map(r => Some(r._3)))
        .collect { case ((_, ts, st), prev) if !prev.contains(st) => (ts, st) }
      changes.zip(changes.drop(1).map(c => Some(c._1)) :+ None).map {
        case ((ts, st), next) => (k, st, ts, next, next.isEmpty)
      }
    }.sorted
    assert(got == expected)
  }

  test("Scd.applyUpdates(fromChangeLog(a), b) equals fromChangeLog(a ∪ b) for forward batches") {
    import graft.etl.Scd
    // split by time: the batch arrives strictly after the initial load
    // (per key). For ARBITRARY interleaving the identity cannot hold for
    // any SCD2 merge: the dimension records collapsed versions, not the
    // duplicate observations inside them, so a batch row landing inside
    // a collapsed run cannot see the run's later re-observations.
    val all = rnd.shuffle(
      (for { k <- 0L until 6L; ts <- 0L until 30L } yield (k, ts)).toSeq)
      .take(150)
      .map { case (k, ts) => (k, ts, s"s${rnd.nextInt(3)}") }
    val (initial, batch) = all.partition(_._2 < 15L)
    val dim = Scd.fromChangeLog(initial.toDF("k", "ts", "st"), Seq("k"), Seq("st"), "ts")
    val merged = Scd.applyUpdates(dim, batch.toDF("k", "ts", "st"), Seq("k"), Seq("st"), "ts")
      .select("k", "st", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq.sorted
    val oneShot = Scd.fromChangeLog(all.toDF("k", "ts", "st"), Seq("k"), Seq("st"), "ts")
      .select("k", "st", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq.sorted
    assert(merged == oneShot)
  }

  test("clusterPairs equals naive union-find; a 200-link chain converges in default rounds") {
    // the chain's diameter (199) is far beyond what diameter-bound
    // min-label propagation covers in default rounds — star contraction
    // must resolve it in O(log² n); ids offset so the chain and the
    // random graph are distinct components
    val chain = (0L until 200L).sliding(2).map(s => (s.head + 1000L, s.last + 1000L)).toSeq
    val randPairs = Seq.fill(150)((rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
    val all = chain ++ randPairs
    val got = Dedup.clusterPairs(all.toDF("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toMap
    // naive union-find reference
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- all) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val expected = parent.keys.map(k => k -> find(k)).toMap
    assert(got == expected)
    assert(got.filter(_._1 >= 1000L).values.toSet == Set(1000L))
  }

  test("clusterPairs hub skew: star graph resolves, round plan has no window minima") {
    // one hub node adjacent to everything — the degenerate degree
    // distribution where a per-center window min would put the whole
    // component into one task. The groupBy+join round must (a) keep the
    // per-center minima OUT of any WindowExec and (b) still converge to
    // a single component rooted at the min id.
    val hub = (1L to 800L).map(i => (5L, 5000L + i)) // hub id 5, spokes above
    val labels = Dedup.clusterPairs(hub.toDF("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toMap
    assert(labels.size == 801 && labels.values.toSet == Set(5L))

    // plan shape, pinned on the round body itself (truncate=false keeps
    // the whole round in ONE lazy plan): per-center minima must be
    // partial-aggregating HashAggregates + joins, zero WindowExec
    val edges = hub.map { case (a, b) => (b, a) }.toDF("u", "v") // high→low
    val stepped = Dedup.starRound(edges, truncate = false)
    assert(PlanShapes.executedShape(stepped).windows == 0,
      "star-round minima regressed to window functions")
  }
}
