package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench self-heal's history half to the COMMITTED baseline
  * file. Round 10 shipped the self-heal dead: the parse regex required
  * compact JSON while tools/make_baseline.py writes indent=1, the
  * `catch Throwable => Map.empty` swallowed the mismatch, and no spec
  * loaded the real file — so baseline_ratio was null for all 260
  * queries and the "baseline" requeue trigger was unreachable. This
  * spec is the missing test: it parses the file the repo actually
  * commits, and exercises the trigger logic the artifact depends on.
  * No SparkSession — pure functions only. */
class BaselineSpec extends AnyFunSuite {

  private def committed: String = {
    // relative to the forked test JVM's working dir = the repo root —
    // the one path that works in any checkout location
    val p = java.nio.file.Paths.get("BENCH_BASELINE.json").toAbsolutePath
    assert(java.nio.file.Files.exists(p), s"missing committed baseline at $p")
    java.nio.file.Files.readString(p)
  }

  test("committed BENCH_BASELINE.json parses to >= 260 (cold, warm) entries") {
    val base = Bench.parseBaseline(committed)
    assert(base.size >= 260, s"parsed only ${base.size} baseline entries - " +
      "the history half of the self-heal would silently no-op (the r10 defect)")
    // every entry is a plausible timing, not a mis-grouped fragment
    base.foreach { case (name, (c, w)) =>
      assert(name.matches("[a-z]\\d+[a-z]?_.*"), s"non-query key parsed: $name")
      assert(c > 0 && c < 3600, s"$name cold=$c out of range")
      assert(w > 0 && w < 3600, s"$name warm=$w out of range")
    }
  }

  test("parse tolerates both indent=1 (the committed format) and compact JSON") {
    val indented =
      """{
        | "note": "x",
        | "queries": {
        |  "q1_agg": {
        |   "cold": 1.25,
        |   "warm": 0.5
        |  },
        |  "q2_join": {
        |   "cold": 2e-1,
        |   "warm": 0.1
        |  }
        | }
        |}""".stripMargin
    assert(Bench.parseBaseline(indented) ===
      Map("q1_agg" -> (1.25, 0.5), "q2_join" -> (0.2, 0.1)))
    val compact = """{"queries":{"q1_agg":{"cold":1.25,"warm":0.5}}}"""
    assert(Bench.parseBaseline(compact) === Map("q1_agg" -> (1.25, 0.5)))
  }

  test("baseline trigger fires on a 3x-inflated timing with a clean cold/warm ratio") {
    // both phases inflated 3x by ambient load: ratio looks healthy
    // (cold ~2x warm is normal), only history can catch it - the r9
    // c23/d15 phantom class this machinery was built for
    val base = Some((6.0, 5.0))
    assert(Bench.requeueTrigger(cold = 18.0, warm = Some(15.0), base) ===
      Some("baseline"))
    // clean run vs its own history: no trigger
    assert(Bench.requeueTrigger(cold = 6.5, warm = Some(5.2), base) === None)
    // ratio anomaly wins the label even when history also breaches
    assert(Bench.requeueTrigger(cold = 40.0, warm = Some(5.0), base) ===
      Some("ratio"))
    // warm-only history breach still triggers
    assert(Bench.requeueTrigger(cold = 7.0, warm = Some(11.0), base) ===
      Some("baseline"))
    // no history, clean ratio: nothing to compare against
    assert(Bench.requeueTrigger(cold = 18.0, warm = Some(15.0), None) === None)
  }
}
