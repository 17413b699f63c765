package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = (0L until 2000L).map(i => (i, if (i % 4 == 0) "en" else "de"))
    .toDF("id", "lang")

  test("hashSample is deterministic and key-stable across repartitioning") {
    val a = Sampling.hashSample(rows, col("id"), 0.2).select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(rows.repartition(13), col("id"), 0.2)
      .select("id").as[Long].collect().toSet
    assert(a == b) // selection survives any physical layout
    assert(math.abs(a.size - 400) < 80) // ~20% of 2000, loose bound
  }

  test("fraction edges: 0 keeps nothing, 1 keeps everything") {
    assert(Sampling.hashSample(rows, col("id"), 0.0).count() == 0)
    assert(Sampling.hashSample(rows, col("id"), 1.0).count() == 2000)
  }

  test("different salts draw independent samples") {
    val a = Sampling.hashSample(rows, col("id"), 0.5, salt = "train")
      .select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(rows, col("id"), 0.5, salt = "valid")
      .select("id").as[Long].collect().toSet
    assert(a != b)
    // overlap near 25% of corpus (independent 50% draws), loosely bounded
    val overlap = (a & b).size
    assert(overlap > 300 && overlap < 700)
  }

  test("stratifiedHashSample applies per-stratum fractions") {
    val kept = Sampling.stratifiedHashSample(rows, col("id"), col("lang"),
      Map("en" -> 1.0), default = 0.0)
    assert(kept.count() == 500) // all en, no de
    assert(kept.filter(col("lang") === "de").count() == 0)
  }

  test("rebalanceToMix hits the target shares with the binding stratum kept whole") {
    // 500 en / 1500 de, target 1:1 → en binds (T = 1000): ALL en kept,
    // de downsampled to ~500
    val kept = Sampling.rebalanceToMix(rows, col("id"), col("lang"),
      Map("en" -> 0.5, "de" -> 0.5))
    val byLang = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang("en") == 500) // binding stratum: fraction exactly 1
    assert(math.abs(byLang("de") - 500L) < 100) // hash sampling is approximate
    assert(kept.columns.toSeq == rows.columns.toSeq) // helper columns dropped
  }

  test("rebalanceToMix drops unweighted strata and is deterministic") {
    val kept = Sampling.rebalanceToMix(rows, col("id"), col("lang"), Map("en" -> 1.0))
    assert(kept.filter(col("lang") === "de").count() == 0)
    assert(kept.count() == 500)
    val a = Sampling.rebalanceToMix(rows, col("id"), col("lang"),
      Map("en" -> 0.3, "de" -> 0.7)).select("id").as[Long].collect().toSet
    val b = Sampling.rebalanceToMix(rows.repartition(7), col("id"), col("lang"),
      Map("en" -> 0.3, "de" -> 0.7)).select("id").as[Long].collect().toSet
    assert(a == b) // layout-independent selection
  }

  test("rebalanceToMix kept rows are a subset of the input") {
    val keptIds = Sampling.rebalanceToMix(rows, col("id"), col("lang"),
      Map("en" -> 0.9, "de" -> 0.1)).select("id").as[Long].collect().toSet
    val all = rows.select("id").as[Long].collect().toSet
    assert(keptIds.subsetOf(all))
    // 9:1 target from 500 en: T = min(500/.9, 1500/.1) = 555.5 →
    // ~500 en + ~55 de; the de share lands near 10%
    val de = Sampling.rebalanceToMix(rows, col("id"), col("lang"),
      Map("en" -> 0.9, "de" -> 0.1)).filter(col("lang") === "de").count()
    assert(de > 25 && de < 90, s"de kept $de, expected ~55")
  }

  test("rebalanceToMix scans the corpus exactly twice: counts + filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rebal").toString
    rows.write.mode("overwrite").parquet(dir)
    val pq = spark.read.parquet(dir)
    val plan = Sampling.rebalanceToMix(pq, col("id"), col("lang"),
      Map("en" -> 0.5, "de" -> 0.5)).queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    // a third scan would mean the counts aggregate got two plan parents
    // (the agg+crossJoin formulation this replaced)
    assert(scans == 2, s"expected 2 parquet scans, got $scans in:\n$plan")
  }

  test("temperatureMix: alpha=1 is the identity, smallest stratum always kept whole") {
    assert(Sampling.temperatureMix(rows, col("id"), col("lang"), alpha = 1.0).count() == 2000)
    // alpha=0.5 with 500 en / 1500 de: f_en = 1 (smallest binds),
    // f_de = (500/1500)^0.5 ≈ 0.577 → ~866 de kept
    val byLang = Sampling.temperatureMix(rows, col("id"), col("lang"), alpha = 0.5)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang("en") == 500, "the smallest stratum keeps every row")
    assert(math.abs(byLang("de") - 866L) < 100, s"de kept ${byLang("de")}, expected ~866")
    assert(
      Sampling.temperatureMix(rows, col("id"), col("lang"), alpha = 0.5).columns.toSeq ==
        rows.columns.toSeq)
  }

  test("temperatureMix: alpha near 0 flattens toward uniform counts") {
    val byLang = Sampling.temperatureMix(rows, col("id"), col("lang"), alpha = 0.01)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang("en") == 500)
    assert(math.abs(byLang("de") - 500L) < 100,
      s"de kept ${byLang("de")}, expected ~500 (uniform at alpha→0)")
  }

  test("temperatureMix selection is layout-independent and a subset of the input") {
    val a = Sampling.temperatureMix(rows, col("id"), col("lang"), alpha = 0.7)
      .select("id").as[Long].collect().toSet
    val b = Sampling.temperatureMix(rows.repartition(7), col("id"), col("lang"), alpha = 0.7)
      .select("id").as[Long].collect().toSet
    assert(a == b)
    assert(a.subsetOf(rows.select("id").as[Long].collect().toSet))
  }

  test("exactKPerStratum keeps exactly min(k, |stratum|) rows, layout-independent") {
    val kept = Sampling.exactKPerStratum(rows, col("id"), col("lang"), k = 25)
    val byLang = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang == Map("en" -> 25L, "de" -> 25L)) // exact size, not approximate
    val a = kept.select("id").as[Long].collect().toSet
    val b = Sampling.exactKPerStratum(rows.repartition(11), col("id"), col("lang"), k = 25)
      .select("id").as[Long].collect().toSet
    assert(a == b) // same members on any layout
    // k larger than the stratum → whole stratum, no padding
    val small = Sampling.exactKPerStratum(rows.filter(col("id") < 8), col("id"), col("lang"), k = 100)
    assert(small.count() == 8)
  }

  test("rebalanceToMix rejects non-positive weights and reserved columns") {
    intercept[IllegalArgumentException] {
      Sampling.rebalanceToMix(rows, col("id"), col("lang"), Map("en" -> 0.0))
    }
    intercept[IllegalArgumentException] {
      Sampling.rebalanceToMix(rows.withColumn("__cut", lit(1)), col("id"), col("lang"),
        Map("en" -> 1.0))
    }
  }

  test("assignSplit covers every row, roughly honors fractions, is layout-stable") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val s = rows.select(col("id"), Sampling.assignSplit(col("id"), splits).as("split"))
    val counts = s.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(counts.values.sum == 2000)
    assert(counts("train") > 1500 && counts("train") < 1700) // ~1600
    val a = s.as[(Long, String)].collect().toMap
    val b = rows.repartition(7)
      .select(col("id"), Sampling.assignSplit(col("id"), splits).as("split"))
      .as[(Long, String)].collect().toMap
    assert(a == b)
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(col("id"), Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("leakageSafeSplit co-assigns exact duplicates by content") {
    val docs = Seq(
      (1L, "The Quick  brown fox"),
      (2L, "the quick brown FOX "), // same after normalization
      (3L, "something else entirely"))
      .toDF("doc_id", "text")
    val out = Sampling.leakageSafeSplit(docs, col("text"),
        Seq("train" -> 0.5, "eval" -> 0.5))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(out(1L) == out(2L)) // dups can never straddle the split
  }

  test("cluster-keyed assignSplit co-assigns chained near-duplicates") {
    // a~b, b~c: all three must land in ONE split even though a and c
    // never appear in a pair together
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val labels = graft.dedup.Dedup.clusterPairs(pairs)
    val assigned = labels.select(col("doc_id"),
        Sampling.assignSplit(col("cluster_id"), Seq("train" -> 0.5, "eval" -> 0.5)).as("split"))
      .as[(Long, String)].collect().toMap
    assert(assigned.values.toSet.size == 1)
  }

  test("tokenBudgetPerStratum: best-first, budget never exceeded, first crossing cut") {
    val rows = Seq(
      // (id, src, cost, quality)
      (1L, "a", 40L, 9.0), (2L, "a", 50L, 8.0), (3L, "a", 30L, 7.0), (4L, "a", 10L, 6.0),
      (5L, "b", 100L, 5.0), (6L, "b", 100L, 5.0), (7L, "b", 1L, 4.0)
    ).toDF("id", "src", "cost", "q")
    val kept = Sampling.tokenBudgetPerStratum(rows, col("src"), col("cost"),
        col("q"), col("id"), budget = 100L)
      .select("id", "cum_cost").as[(Long, Long)].collect().toMap
    // a: 40, 90, then 30 would cross (120) → cut, and so is everything after
    assert(kept.keySet.filter(_ <= 4L) == Set(1L, 2L))
    assert(kept(2L) == 90L)
    // b: tie on quality broken by id → 5 kept at exactly budget, 6 cut, 7 cut (order is rank order)
    assert(kept.keySet.filter(_ >= 5L) == Set(5L))
    assert(kept(5L) == 100L)
  }

  test("tokenBudgetPerStratum: strata are independent and determinism holds across reruns") {
    val rows = (1L to 200L).map(i => (i, s"s${i % 4}", i % 7 + 1, (i * 37 % 11).toDouble))
      .toDF("id", "src", "cost", "q")
    def run() = Sampling.tokenBudgetPerStratum(rows.repartition(7), col("src"),
        col("cost"), col("q"), col("id"), budget = 50L)
      .select("id").as[Long].collect().toSet
    val first = run()
    assert(first == run(), "selection must be layout-independent")
    val perSrc = Sampling.tokenBudgetPerStratum(rows, col("src"), col("cost"),
        col("q"), col("id"), budget = 50L)
      .groupBy("src").agg(max("cum_cost").as("m")).as[(String, Long)].collect()
    assert(perSrc.nonEmpty && perSrc.forall(_._2 <= 50L))
  }

  test("weightedSampleK: exact k, deterministic, weight-tracking inclusion") {
    val df = (1L to 3000L).map(i => (i, if (i <= 1500) 1.0 else 10.0)).toDF("id", "w")
    def run() = Sampling.weightedSampleK(df.repartition(7), col("id"), col("w"), k = 300)
      .select("id").as[Long].collect().toSet
    val s = run()
    assert(s.size == 300, "exactly k rows")
    assert(s == run(), "deterministic and layout-independent")
    // 10×-weighted half should dominate the sample ~10:1
    val heavy = s.count(_ > 1500L)
    assert(heavy > 220 && heavy < 290, s"heavy half drew $heavy of 300 — expected ≈ 272")
  }

  test("weightedSampleK: non-positive weights are excluded; k larger than input keeps all") {
    val df = Seq((1L, 2.0), (2L, 0.0), (3L, -1.0), (4L, 5.0)).toDF("id", "w")
    val s = Sampling.weightedSampleK(df, col("id"), col("w"), k = 10)
      .select("id").as[Long].collect().toSet
    assert(s == Set(1L, 4L))
  }

  test("epochShuffle: deterministic per epoch, decorrelated across epochs, lossless") {
    val rows = (1L to 300L).toDF("id")
    def order(epoch: Long): Seq[Long] =
      Sampling.epochShuffle(rows, col("id"), epoch).as[Long].collect().toSeq
    val e0 = order(0L)
    assert(e0 == order(0L), "same epoch must reproduce the same order")
    assert(e0.sorted == (1L to 300L), "shuffle must lose nothing")
    val e1 = order(1L)
    assert(e0 != e1, "different epochs must permute differently")
    // decorrelation sanity: few ids keep their epoch-0 position
    val fixed = e0.zip(e1).count { case (a, b) => a == b }
    assert(fixed < 15, s"$fixed of 300 positions unchanged across epochs")
  }
}
