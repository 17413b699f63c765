package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  // classic sequential PAV over (rate, weight) bins — the reference the
  // minimax closed form must reproduce
  private def pav(bins: Seq[(Double, Long)]): Seq[Double] = {
    val st = scala.collection.mutable.ArrayBuffer[(Double, Long, Int)]() // avg, w, span
    for ((v, w) <- bins) {
      st += ((v, w, 1))
      while (st.size > 1 && st(st.size - 2)._1 > st.last._1) {
        val (v2, w2, s2) = st.remove(st.size - 1)
        val (v1, w1, s1) = st.remove(st.size - 1)
        st += (((v1 * w1 + v2 * w2) / (w1 + w2), w1 + w2, s1 + s2))
      }
    }
    st.flatMap { case (v, _, s) => Seq.fill(s)(v) }.toSeq
  }

  test("isotonicCalibration reproduces sequential PAV on a violating profile") {
    // per-bin rates deliberately non-monotone
    val rows = Seq(
      (0.05, Seq(0, 0, 1)), (0.15, Seq(1, 1, 1, 0)), (0.25, Seq(0, 0, 0, 0, 1)),
      (0.35, Seq(1, 0)), (0.45, Seq(1, 1, 0, 1)), (0.55, Seq(0, 1)),
      (0.65, Seq(1, 1, 1)), (0.75, Seq(1, 0, 1, 1)), (0.85, Seq(1)),
      (0.95, Seq(1, 1, 0, 1, 1))).flatMap { case (s, ys) => ys.map(y => (s, y)) }
    val got = Calibration.isotonicCalibration(rows.toDF("s", "y"),
        col("s"), col("y"), nBins = 10)
      .orderBy("bin").select("bin", "n", "raw_rate", "calibrated")
      .as[(Int, Long, Double, Double)].collect()
    val ref = pav(got.map(r => (r._3, r._2)).toSeq)
    got.zip(ref).foreach { case (r, want) =>
      assert(math.abs(r._4 - want) < 1e-12, s"bin ${r._1}: ${r._4} vs PAV $want")
    }
    // monotone by construction
    assert(got.map(_._4).sliding(2).forall(w => w(0) <= w(1) + 1e-12))
  }

  test("already-monotone rates pass through; fully decreasing pools to the global mean") {
    val mono = Seq((0.1, 0), (0.1, 0), (0.5, 1), (0.5, 0), (0.9, 1), (0.9, 1))
    val g1 = Calibration.isotonicCalibration(mono.toDF("s", "y"),
        col("s"), col("y"), nBins = 5)
      .orderBy("bin").select("raw_rate", "calibrated").as[(Double, Double)].collect()
    g1.foreach { case (raw, cal) => assert(math.abs(raw - cal) < 1e-12) }

    val dec = Seq((0.1, 1), (0.5, 1), (0.5, 0), (0.9, 0))
    val g2 = Calibration.isotonicCalibration(dec.toDF("s", "y"),
        col("s"), col("y"), nBins = 5)
      .select("calibrated").as[Double].collect()
    g2.foreach(c => assert(math.abs(c - 0.5) < 1e-12)) // global mean 2/4
  }

  test("out-of-range and null scores are excluded; top edge lands in the last bin") {
    val df = Seq((1.0, 1), (1.5, 0), (-0.2, 0), (0.999, 1)).toDF("s", "y")
    val got = Calibration.isotonicCalibration(df, col("s"), col("y"), nBins = 4)
      .select("bin", "n").as[(Int, Long)].collect().toSeq
    assert(got === Seq((3, 2L))) // only 1.0 and 0.999, both in bin 3
  }
}
