package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants over randomized inputs — the complement of
  * the example-based suites: each law here must hold for EVERY input,
  * not just the hand-picked fixtures. Generation is seeded (fixed
  * seeds, not `sample`) so failures reproduce, and Spark round-trips
  * are batched — all generated cases ride ONE DataFrame per property,
  * so a property costs one job, not one job per case.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def generate[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val tokenGen: Gen[List[String]] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c", "aa")))

  test("collapseRuns: no adjacent dups, order-preserving, idempotent, = naive — for all inputs") {
    val cases = generate(Gen.listOfN(200, tokenGen), 42L).zipWithIndex
    val out = cases.map { case (t, i) => (t, i) }.toDF("toks", "i")
      .select(col("i"), col("toks"),
        graft.text.TextFunctions.collapseRuns(col("toks")).as("once"))
      .select(col("i"), col("once"),
        graft.text.TextFunctions.collapseRuns(col("once")).as("twice"))
      .as[(Int, Seq[String], Seq[String])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    cases.foreach { case (toks, i) =>
      val (once, twice) = out(i)
      // law 1: no two adjacent survivors are equal
      assert(once.zip(once.drop(1)).forall { case (x, y) => x != y }, s"adjacent dup in $once")
      // law 2: idempotent
      assert(twice == once, s"not idempotent: $once -> $twice")
      // law 3: equals the naive single-threaded reference
      val expected = toks.foldLeft(List.empty[String]) {
        case (acc, x) if acc.headOption.contains(x) => acc
        case (acc, x) => x :: acc
      }.reverse
      assert(once == expected, s"input $toks: got $once, expected $expected")
    }
  }

  test("snapshot digest: equal iff the column tuples are equal — for all inputs") {
    // the load-bearing A23/E16 invariant: the digest is injective over
    // (nullable) column tuples — no re-segmentation across the column
    // boundary, no null/empty confusion — and depends on nothing else
    val cellGen: Gen[Option[String]] = Gen.frequency(
      2 -> Gen.const(None),
      2 -> Gen.const(Some("")),
      3 -> Gen.const(Some("null")),       // the sentinel as a real value
      5 -> Gen.choose(0, 6).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("a", "b", ":", "1", "")).map(l => Some(l.mkString))))
    val pairGen = Gen.zip(cellGen, cellGen)
    val cases = generate(Gen.listOfN(300, pairGen), 7L).zipWithIndex
    val digests = cases.map { case ((x, y), i) => (i, x, y) }
      .toDF("i", "x", "y")
      .select(col("i"),
        graft.etl.SnapshotDiff.digestOf(Seq(col("x"), col("y"))).as("d"))
      .as[(Int, String)].collect().toMap
    cases.foreach { case ((x1, y1), i) =>
      cases.foreach { case ((x2, y2), j) =>
        val same = (x1, y1) == (x2, y2)
        assert((digests(i) == digests(j)) == same,
          s"digest ${if (same) "must" else "must NOT"} match: ($x1,$y1) vs ($x2,$y2)")
      }
    }
  }

  test("int8 quantization round-trip error is bounded by scale/2 — for all vectors") {
    import graft.vectors.Quantize
    val vecGen = Gen.choose(1, 16).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-100.0, 100.0).map(_.toFloat)))
    val cases = generate(Gen.listOfN(150, vecGen), 7L).zipWithIndex
    val rows = cases.map { case (v, i) => (v, i) }.toDF("v", "i")
      .select(col("i"), col("v"), Quantize.int8Scale(col("v")).as("s"))
      .select(col("i"), col("s"),
        Quantize.int8MaxError(col("v"), Quantize.int8Quantize(col("v"), col("s")), col("s")).as("err"))
      .as[(Int, Double, Double)].collect()
    rows.foreach { case (i, s, err) =>
      assert(err <= s / 2 + 1e-9, s"case $i: round-trip error $err exceeds scale/2 = ${s / 2}")
    }
  }

  test("packSequences: every doc lands once; non-final packs reach the budget — for all corpora") {
    import graft.operators.Packing
    val docGen = Gen.choose(0, 40).map(n => List.fill(n)("tok").mkString(" "))
    (1 to 5).foreach { seed =>
      val docs = generate(Gen.listOfN(30, docGen), seed.toLong)
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val packed = Packing.packSequences(df, col("doc_id"), col("text"), budget = 50, nShards = 3)
        .select("doc_id", "shard", "n_tokens", "pack_id")
        .as[(Long, Long, Long, Long)].collect()
      assert(packed.length == docs.length) // every doc in exactly one pack
      // exact reference: within each shard, in doc-id order, a doc's
      // pack is floor(exclusive running token count / budget) — an
      // overshooting doc legitimately eats into the next pack's
      // interval (the documented streaming approximation), so the
      // invariant is the prefix-sum rule itself, not per-pack totals
      packed.groupBy(_._2).foreach { case (_, shardRows) =>
        var cum = 0L
        shardRows.sortBy(_._1).foreach { case (docId, _, n, pack) =>
          assert(pack == cum / 50,
            s"seed $seed doc $docId: pack $pack, expected ${cum / 50} (prefix $cum)")
          cum += n
        }
      }
      // and cumulative coverage: when pack P+1 opens, at least (P+1)·b
      // tokens have been absorbed by packs ≤ P
      packed.groupBy(_._2).foreach { case (_, shardRows) =>
        val byPack = shardRows.groupBy(_._4).view.mapValues(_.map(_._3).sum).toMap
        val maxPack = byPack.keys.max
        (0L until maxPack).foreach { p =>
          val through = byPack.filter(_._1 <= p).values.sum
          assert(through >= (p + 1) * 50,
            s"seed $seed: packs 0..$p absorbed only $through tokens")
        }
      }
    }
  }

  test("tokenBudgetPerStratum: = the naive per-stratum greedy reference — for all inputs") {
    val rowGen = for {
      src <- Gen.oneOf("s0", "s1", "s2")
      cost <- Gen.choose(1L, 40L)
      q <- Gen.choose(0, 9).map(_.toDouble)
    } yield (src, cost, q)
    val rows = generate(Gen.listOfN(300, rowGen), 7L).zipWithIndex
      .map { case ((s, c, q), i) => (i.toLong, s, c, q) }
    val kept = graft.operators.Sampling.tokenBudgetPerStratum(
        rows.toDF("id", "src", "cost", "q"),
        col("src"), col("cost"), col("q"), col("id"), budget = 120L)
      .select("id", "cum_cost").as[(Long, Long)].collect().toMap
    rows.groupBy(_._2).foreach { case (_, g) =>
      var cum = 0L
      g.sortBy(r => (-r._4, r._1)).foreach { case (id, _, c, _) =>
        cum += c
        if (cum <= 120L) assert(kept.get(id).contains(cum), s"id $id: expected cum $cum, got ${kept.get(id)}")
        else assert(!kept.contains(id), s"id $id kept past the budget (cum $cum)")
      }
    }
  }

  test("equiDepthHistogram: lossless, ordered, depth within one cell's mass — for all inputs") {
    val vals = generate(Gen.listOfN(400, Gen.choose(0, 999).map(_ / 10.0)), 11L)
    val out = graft.analytics.Kpis.equiDepthHistogram(
        vals.toDF("v"), col("v"), buckets = 5, lo = 0.0, hi = 100.0, cells = 50)
      .orderBy("bucket")
      .select("bucket", "n", "lo", "hi").as[(Long, Long, Double, Double)].collect().toSeq
    assert(out.map(_._2).sum == vals.length, "histogram must lose no row")
    out.sliding(2).foreach {
      case Seq(a, b) => assert(a._4 <= b._3, s"buckets overlap: $a / $b")
      case _ =>
    }
    // depth bound: every bucket ≤ ideal depth + one cell's mass
    val cellMass = vals.groupBy(v => math.min(49, (v / 2.0).toInt)).values.map(_.size).max
    val ideal = vals.length / 5.0
    out.foreach { case (b, n, _, _) =>
      assert(n <= ideal + cellMass, s"bucket $b depth $n exceeds $ideal + $cellMass")
    }
  }

  test("assignBalancedShards: every row assigned once, in range — for all inputs") {
    val rows = generate(Gen.listOfN(250, Gen.choose(1L, 500L)), 13L).zipWithIndex
      .map { case (c, i) => (i.toLong, c) }
    val out = graft.operators.Packing.assignBalancedShards(
        rows.toDF("id", "cost"), col("id"), col("cost"), shards = 6)
      .select("id", "shard").as[(Long, Int)].collect().toSeq
    assert(out.length == rows.length && out.map(_._1).distinct.length == rows.length)
    assert(out.forall { case (_, s) => s >= 0 && s < 6 })
  }
}
