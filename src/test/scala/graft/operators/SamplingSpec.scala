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
}
