package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Plan-shape regression net: a query that silently degrades to a
  * cartesian product would still pass row-level checks at sf0.01 while
  * being unrunnable at scale. Every declared query must plan without
  * CartesianProduct; BroadcastNestedLoopJoin is allowed only where it IS
  * the design (a broadcast small side with a non-equi condition). */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Queries whose plan legitimately contains a BroadcastNestedLoopJoin:
    * d5 broadcasts the query set against the corpus with a non-equi
    * (qid != cid) condition — the documented brute-force baseline; d16
    * broadcasts a single-row corpus count; d23 broadcasts the nLists-row
    * centroid table against corpus and query sides (every vector scores
    * every coarse centroid by design — that product is O(n·nLists), the
    * IVF cost model, not an accident); d26, d35 and d37 broadcast a
    * single-row corpus-total aggregate (the d16 pattern); d38 broadcasts
    * the nLists-row centroid table like d23. */
  private val allowedBnlj = Set("d5_ann_bruteforce", "d16_tfidf", "d23_ann_ivf",
    "d23b_ann_ivf_hier", // broadcasts the top/sub centroid tables like d23
    "d26_source_divergence", "d35_doc_xentropy", "d37_bigram_xentropy",
    "d38_semantic_dedup")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"plan of $name has no cartesian product${if (allowedBnlj(name)) "" else " and no nested-loop join"}") {
      val plan = fn(spark, dir).queryExecution.executedPlan
      val cartesian = plan.collect { case c: CartesianProductExec => c }
      assert(cartesian.isEmpty, s"$name plans a CartesianProduct:\n$plan")
      if (!allowedBnlj(name)) {
        val bnlj = plan.collect { case b: BroadcastNestedLoopJoinExec => b }
        assert(bnlj.isEmpty, s"$name plans a BroadcastNestedLoopJoin:\n$plan")
      }
    }
  }
}
