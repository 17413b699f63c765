package graft

/** Golden executed-plan suite: every driver query's executed shape
  * (scans / generates / shuffles / broadcasts, counted AFTER execution
  * with ReusedExchange subtrees excluded) must match the committed
  * golden file. This is the permanent fence around the multi-parent
  * re-execution class of defect — a refactor that silently gives an
  * expensive subtree a second plan parent shows up here as an extra
  * scan or generate even though sf0.01 rows still hash-match, and a
  * new shuffle in a narrow pipeline shows up as an exchange diff.
  *
  * On an INTENDED shape change, regenerate with
  * `sbt "Test/runMain graft.GoldenPlans"` and review the file diff in
  * the commit.
  */
class GoldenPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val golden = PlanShapes.readGolden()

  test("golden file covers exactly the declared query set") {
    val queries = SparkEntry.queries.keySet
    val missing = queries -- golden.keySet
    val stale = golden.keySet -- queries
    assert(missing.isEmpty && stale.isEmpty,
      s"regenerate golden_plans.txt — missing=${missing.toSeq.sorted} stale=${stale.toSeq.sorted}")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executed plan matches golden shape") {
      val got = PlanShapes.executedShape(fn(spark, dir)).toString
      val want = golden.getOrElse(name, "<absent>")
      assert(got == want, s"$name shape drifted: got [$got] want [$want] — if intended, " +
        "regenerate via `sbt \"Test/runMain graft.GoldenPlans\"` and commit the diff")
    }
  }
}
