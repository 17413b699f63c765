package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AggStateSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("k")
  private val vals = Seq("x", "y")

  private def rows(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { _ =>
      ("k" + rnd.nextInt(5),
        if (rnd.nextInt(10) == 0) null else java.lang.Double.valueOf(rnd.nextDouble() * 100),
        java.lang.Long.valueOf(rnd.nextInt(1000).toLong))
    }.toDF("k", "x", "y")
  }

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("k").collect().map(_.toSeq.map {
      case d: Double => math.round(d * 1e9) // FP sum order differs across plans
      case v => v
    }).toSeq

  test("state(a union b) == merge(state(a), state(b)) — the defining property") {
    val (a, b) = (rows(1, 300), rows(2, 500))
    val direct = AggState.state(a.unionByName(b), keys, vals)
    val merged = AggState.merge(Seq(AggState.state(a, keys, vals),
      AggState.state(b, keys, vals)), keys, vals)
    assert(canon(direct) == canon(merged))
  }

  test("merge is associative: ((a+b)+c) == (a+(b+c))") {
    val sts = Seq(rows(3, 100), rows(4, 200), rows(5, 150))
      .map(AggState.state(_, keys, vals))
    val left = AggState.merge(Seq(AggState.merge(sts.take(2), keys, vals), sts(2)), keys, vals)
    val right = AggState.merge(Seq(sts(0), AggState.merge(sts.drop(1), keys, vals)), keys, vals)
    assert(canon(left) == canon(right))
  }

  test("applyDelta folds a raw batch into persisted state") {
    val (base, batch) = (rows(6, 400), rows(7, 50))
    val incr = AggState.applyDelta(AggState.state(base, keys, vals), batch, keys, vals)
    val direct = AggState.state(base.unionByName(batch), keys, vals)
    assert(canon(incr) == canon(direct))
  }

  test("null semantics: sums/mins ignore nulls, cnt counts non-null, all-null group") {
    val df = Seq(("a", null, 1L), ("a", java.lang.Double.valueOf(2.0), 2L),
      ("b", null, 3L)).toDF("k", "x", "y")
    val st = AggState.state(df, keys, Seq("x")).orderBy("k").collect()
    val a = st(0); val b = st(1)
    assert(a.getLong(a.fieldIndex("n_rows")) == 2L)
    assert(a.getLong(a.fieldIndex("cnt_x")) == 1L && a.getDouble(a.fieldIndex("sum_x")) == 2.0)
    assert(b.getLong(b.fieldIndex("cnt_x")) == 0L && b.isNullAt(b.fieldIndex("sum_x")))
  }

  test("finalizeState: avg = sum/cnt, null for an all-null group") {
    val df = Seq(("a", java.lang.Double.valueOf(1.0)), ("a", java.lang.Double.valueOf(3.0)),
      ("b", null)).toDF("k", "x")
    val fin = AggState.finalizeState(AggState.state(df, keys, Seq("x")), Seq("x"))
      .orderBy("k").collect()
    assert(fin(0).getDouble(fin(0).fieldIndex("avg_x")) == 2.0)
    assert(fin(1).isNullAt(fin(1).fieldIndex("avg_x")))
  }

  test("building state is one partial-aggregating shuffle") {
    val st = AggState.state(rows(8, 100), keys, vals)
    st.collect()
    val plan = st.queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), plan) // map-side combine present
  }
}
