package graft.graph

import graft.operators.Lineage
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Parent-pointer hierarchy flattening — the relational "find my root"
  * workload (org charts, category trees, reply threads, file-system
  * paths, ticket duplicate chains): given (node, parent) rows, resolve
  * every node's ROOT ancestor and depth.
  *
  * The naive approach is depth-many self-joins (or a recursive CTE,
  * which Spark does not have); both die on deep chains. This is POINTER
  * DOUBLING (path halving): each round joins the table to itself on the
  * current ancestor pointer, so a node's known ancestor jumps from
  * 2^k steps up to 2^(k+1) — a 10^6-deep pathological chain resolves in
  * 20 rounds, and a realistic 20-deep tree in 5. Each round is one
  * hash equi-join on the ancestor key + [[Lineage.truncate]] (the
  * d15/BFS iteration discipline); rows already at a root stop moving
  * (their join side is empty by construction, not filtered per row).
  * The same doubling trick as D15's star contraction, specialized to
  * forests where it needs no min-election at all.
  *
  * Cycles (data corruption in a supposed forest) cannot resolve to a
  * root; after the doubling rounds exhaust `maxDepth` they are still
  * un-done and reported with `root = null, depth = null` rather than
  * looping forever or throwing mid-job — route them to a reject sink
  * (the A1 discipline) and fix upstream.
  */
object Hierarchy {

  /** Resolve (node, root, depth) for every node in `rel`. `parent` null
    * means the node IS a root (root = itself, depth 0). `maxDepth`
    * bounds the resolvable chain length (rounds = ⌈log2⌉ + 1); nodes
    * deeper than that — or on a cycle — come back with null root/depth. */
  def flatten(
      rel: DataFrame, node: Column, parent: Column, maxDepth: Int = 1 << 20): DataFrame = {
    require(maxDepth >= 1, s"maxDepth must be >= 1, got $maxDepth")
    // state: (node, anc, depth-to-anc, done). A done row's anc is its root.
    var state = Lineage.truncate(rel.select(
      node.as("node"),
      coalesce(parent, node).as("anc"),
      when(parent.isNull, 0L).otherwise(1L).as("depth"),
      parent.isNull.as("done")))
    val rounds = 64 - java.lang.Long.numberOfLeadingZeros(maxDepth.toLong) + 1
    var round = 0L
    var open = state.filter(!col("done")).count()
    while (round < rounds && open > 0) {
      val anc = state.select(col("node").as("__a_node"), col("anc").as("__a_anc"),
        col("depth").as("__a_depth"), col("done").as("__a_done"))
      state = Lineage.truncate(state
        .join(anc, col("anc") === col("__a_node"), "left")
        .select(
          col("node"),
          // a missing ancestor row means the parent id is itself unknown
          // (dangling pointer): treat the pointer as terminal — the
          // referenced id is the best root statement the data supports
          when(col("done") || col("__a_node").isNull, col("anc"))
            .otherwise(col("__a_anc")).as("anc"),
          when(col("done") || col("__a_node").isNull, col("depth"))
            .otherwise(col("depth") + col("__a_depth")).as("depth"),
          (col("done") || col("__a_node").isNull || col("__a_done")).as("done")))
      open = state.filter(!col("done")).count()
      round += 1
    }
    state.select(
      col("node"),
      when(col("done"), col("anc")).as("root"),
      when(col("done"), col("depth")).as("depth"))
  }

  /** Subtree aggregation: for every node, the count and value-sum over
    * its ENTIRE subtree (itself + all descendants) — the hierarchical
    * rollup (org headcount, category revenue, thread size) that SQL
    * does with a recursive CTE and Spark has no operator for.
    *
    * Built on the (descendant, ancestor) CLOSURE by repeated squaring:
    * round k joins the closure to itself ((a,b) ∧ (b,c) → (a,c)), so
    * covered path lengths double — ⌈log₂ maxDepth⌉ hash joins, the
    * [[flatten]] discipline. The closure has O(n · avg-depth) pairs —
    * intrinsic to the answer (every node contributes to each of its
    * ancestors), not a construction artifact; `distinct` per round
    * collapses the duplicate derivations squaring creates (in a tree
    * the PAIR is unique even though its split points are not).
    *
    * Cycles would make the closure ill-defined, so nodes [[flatten]]
    * cannot resolve (`root` null) are EXCLUDED from contributing and
    * receiving — corrupt rows degrade to absent, not wrong; route them
    * via flatten's null-root report. Dangling parents follow flatten's
    * terminal-root convention: the referenced id itself never appears
    * as an output node (it has no row), but its subtree members still
    * aggregate to the nodes below it. */
  def subtreeAgg(
      rel: DataFrame, node: Column, parent: Column, value: Column,
      maxDepth: Int = 1 << 20): DataFrame = {
    require(maxDepth >= 1, s"maxDepth must be >= 1, got $maxDepth")
    val resolved = flatten(rel, node, parent, maxDepth)
      .filter(col("root").isNotNull).select(col("node").as("__ok"))
    val base = rel.select(node.as("node"), parent.as("parent"), value.as("__v"))
      .join(resolved, col("node") === col("__ok")).drop("__ok")
    val edges = Lineage.truncate(base
      .filter(col("parent").isNotNull && col("parent") =!= col("node"))
      .select(col("node").as("desc"), col("parent").as("anc")))
    var closure = edges
    val rounds = 64 - java.lang.Long.numberOfLeadingZeros(maxDepth.toLong)
    var round = 0
    var grew = true
    var size = closure.count()
    while (round < rounds && grew) {
      val hop = closure.select(col("desc").as("__m"), col("anc").as("__a"))
      closure = Lineage.truncate(closure
        .unionByName(closure.join(hop, col("anc") === col("__m"))
          .select(col("desc"), col("__a").as("anc")))
        .distinct())
      val n = closure.count()
      grew = n > size
      size = n
      round += 1
    }
    val contributions = base.select(col("node").as("anc"), col("__v")) // self
      .unionByName(closure.join(base.select(col("node").as("desc"), col("__v")), "desc")
        .select(col("anc"), col("__v")))
    // ancestors outside the validated node set (dangling parent ids)
    // have no row of their own — inner-join back to real nodes
    contributions
      .join(base.select(col("node")), col("anc") === col("node"))
      .groupBy("node")
      .agg(count(lit(1)).as("n_subtree"), sum(col("__v")).as("subtree_sum"))
  }
}
