package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MarkovSpec extends SparkSpec {
  import spark.implicits._

  test("transitions: per-entity ordered pairs, row-normalized, entities isolated") {
    // u1: a→b→a→b ; u2: b→b ; cross-entity pairs must not appear
    val df = Seq(
      ("u1", 1L, "a"), ("u1", 2L, "b"), ("u1", 3L, "a"), ("u1", 4L, "b"),
      ("u2", 1L, "b"), ("u2", 2L, "b")).toDF("u", "t", "s")
    val got = Markov.transitions(df, col("u"), col("t"), col("s"), Seq(col("t")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got === Map(
      ("a", "b") -> (2L, 1.0),
      ("b", "a") -> (1L, 0.5),
      ("b", "b") -> (1L, 0.5)))
  }

  test("transitions: equal timestamps order by the tie-break; nulls excluded") {
    val df = Seq(
      ("u", 5L, 2L, "y"), ("u", 5L, 1L, "x"), ("u", 6L, 3L, "z"))
      .toDF("u", "t", "id", "s")
      .unionAll(Seq((null.asInstanceOf[String], 1L, 9L, "x")).toDF("u", "t", "id", "s"))
    val got = Markov.transitions(df, col("u"), col("t"), col("s"), Seq(col("id")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("x", "y"), ("y", "z")))
  }

  test("stationary: converges to the closed-form vector of a 2-state chain") {
    // P = [[.5,.5],[.25,.75]] → π = (1/3, 2/3)
    val t = Seq(("a", "a", 0.5), ("a", "b", 0.5), ("b", "a", 0.25), ("b", "b", 0.75))
      .toDF("from_state", "to_state", "p")
    val got = Markov.stationary(t, iters = 40)
      .as[(String, Double)].collect().toMap
    assert(math.abs(got("a") - 1.0 / 3) < 1e-9)
    assert(math.abs(got("b") - 2.0 / 3) < 1e-9)
  }

  test("stationary: one hand-computed round from uniform; mass conserved") {
    val t = Seq(("a", "b", 1.0), ("b", "a", 0.5), ("b", "b", 0.5))
      .toDF("from_state", "to_state", "p")
    // uniform (.5,.5): a' = .5·.5 = .25 ; b' = .5·1 + .5·.5 = .75
    val got = Markov.stationary(t, iters = 1).as[(String, Double)].collect().toMap
    assert(math.abs(got("a") - 0.25) < 1e-12 && math.abs(got("b") - 0.75) < 1e-12)
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
  }

  test("stationary: absorbing states redistribute instead of leaking mass") {
    // a→end, end has no outgoing rows
    val t = Seq(("a", "end", 1.0)).toDF("from_state", "to_state", "p")
    val got = Markov.stationary(t, iters = 3).as[(String, Double)].collect().toMap
    assert(math.abs(got.values.sum - 1.0) < 1e-12) // no leak at any round
    // round 1 from (.5,.5): a gets end's redistributed .25… just pin sum + keys
    assert(got.keySet === Set("a", "end"))
    assert(got("end") > got("a")) // mass accumulates at the sink side
  }

  test("end-to-end: transitions feed stationary (composition contract)") {
    val events = Seq(
      ("u1", 1L, "view"), ("u1", 2L, "click"), ("u1", 3L, "view"),
      ("u2", 1L, "view"), ("u2", 2L, "view"), ("u2", 3L, "click"))
      .toDF("u", "t", "s")
    val tr = Markov.transitions(events, col("u"), col("t"), col("s"), Seq(col("t")))
    val pi = Markov.stationary(tr, iters = 5).as[(String, Double)].collect().toMap
    assert(pi.keySet === Set("view", "click"))
    assert(math.abs(pi.values.sum - 1.0) < 1e-9)
  }
}
