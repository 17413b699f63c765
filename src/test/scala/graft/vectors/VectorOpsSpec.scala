package graft.vectors

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("randomProject matches the naive matrix multiply exactly") {
    val dims = 8; val outDim = 3
    val v = Array.tabulate(dims)(d => 0.25 * d - 1.0)
    val scale = math.sqrt(3.0 / outDim.toDouble)
    val expect = (0 until outDim).map { j =>
      (0 until dims).map(d => v(d) * (VectorOps.projCoef(0, j, d) * scale)).sum
    }
    val got = Seq(Tuple1(v.toSeq)).toDF("v")
      .select(VectorOps.randomProject(VectorOps.toDouble(col("v")), dims, outDim).as("p"))
      .as[Seq[Double]].head()
    got.zip(expect).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12) }
  }

  test("randomProject roughly preserves pairwise distances (JL property)") {
    val rnd = new scala.util.Random(7)
    val dims = 64; val outDim = 24
    val vecs = Seq.fill(12)(Array.fill(dims)(rnd.nextGaussian()))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }.toDF("id", "v")
      .select(col("id"), VectorOps.randomProject(VectorOps.toDouble(col("v")), dims, outDim).as("p"))
    val proj = df.as[(Long, Seq[Double])].collect().toMap
    def dist(a: Seq[Double], b: Seq[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val ratios = for {
      i <- vecs.indices; j <- vecs.indices if i < j
    } yield dist(proj(i.toLong), proj(j.toLong)) /
      dist(vecs(i).toSeq, vecs(j).toSeq)
    // JL with k=24: distortion concentrated around 1 — loose 2σ bounds
    assert(ratios.forall(r => r > 0.5 && r < 1.6), s"ratios out of band: $ratios")
  }

  test("randomProject is a narrow map: no shuffle in the plan") {
    val plan = Seq(Tuple1(Seq.fill(4)(1.0))).toDF("v")
      .select(VectorOps.randomProject(col("v"), 4, 2).as("p"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
  }
}
