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
}
