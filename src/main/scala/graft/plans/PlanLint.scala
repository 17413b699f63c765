package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Static plan linter for the scale anti-patterns this library's own
  * operators are built to avoid — turned into a reusable diagnostic a
  * user can run on ANY DataFrame before submitting it against 100 TB.
  * Every rule encodes a lesson measured in this repo:
  *
  *  - `GLOBAL_WINDOW`: a window with an empty PARTITION BY plans as a
  *    single-task global sort (the C33 trap — one executor holds the
  *    whole table).
  *  - `CARTESIAN` / `NESTED_LOOP`: a non-equi or condition-free join
  *    degenerated to O(n·m) (the C16/C30 motivation — re-express as a
  *    binned or union+window join).
  *  - `SINGLE_PARTITION_EXCHANGE`: `repartition(1)`/`coalesce(1)`
  *    upstream of real work funnels the job through one task (a
  *    legitimate final-write tactic, a disaster mid-plan).
  *  - `UNPRUNED_WIDE_SCAN`: a file scan reading EVERY column of a wide
  *    relation — the projection never reached the scan (`ReadSchema`
  *    discipline; A9's reason to exist).
  *
  * The walk inspects the PLANNED physical tree (`sparkPlan`, pre-AQE)
  * so linting never executes the query; AQE can only improve on what
  * is flagged here, never un-flag a global window or a cartesian.
  */
object PlanLint {

  final case class Finding(rule: String, node: String, detail: String)

  /** Minimum column count for a full-width scan to be worth flagging —
    * reading all 3 columns of a 3-column table is not a smell. */
  val WideScanColumns = 6

  /** Maximum row count for a LITERAL local relation to count as a
    * bounded nested-loop side: a BNLJ against a ≤64-row literal table
    * (a probability grid, a bin-edge list, a parameter sweep) is a
    * bounded constant fan-out — linear in the data side, the same cost
    * class as binning replication — not an O(n·m) pair sweep. The row
    * count is known at PLAN time (the rows are literals), so this never
    * mistakes a small-today data table for a constant. */
  val BoundedLocalRows = 64

  def lint(df: DataFrame): Seq[Finding] = walk(df.queryExecution.sparkPlan)

  /** Does this subtree produce a plan-time-bounded row count: exactly
    * one row (a grouping-free global aggregate, possibly under
    * exchanges/projections) or a ≤[[BoundedLocalRows]] literal local
    * relation? */
  private def oneRowPlan(p: SparkPlan): Boolean = p match {
    case l: org.apache.spark.sql.execution.LocalTableScanExec =>
      l.rows.lengthCompare(BoundedLocalRows) <= 0
    case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec =>
      h.groupingExpressions.isEmpty
    case s: org.apache.spark.sql.execution.aggregate.SortAggregateExec =>
      s.groupingExpressions.isEmpty
    case o: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec =>
      o.groupingExpressions.isEmpty
    case j: BroadcastNestedLoopJoinExec if j.condition.isEmpty =>
      oneRowPlan(j.left) && oneRowPlan(j.right) // 1×1 summary assembly
    case other if other.children.size == 1 => oneRowPlan(other.children.head)
    case _ => false
  }

  private def walk(p: SparkPlan): Seq[Finding] = {
    val here: Seq[Finding] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.initialPlan)
      case w: WindowExec if w.partitionSpec.isEmpty =>
        Seq(Finding("GLOBAL_WINDOW", w.nodeName,
          "window has no PARTITION BY: plans as a single-task global sort; " +
            "use Ranking.globalRank/ntileExact or add a partition key"))
      case _: CartesianProductExec =>
        Seq(Finding("CARTESIAN", p.nodeName,
          "cartesian product: O(left × right) rows; add an equi-condition " +
            "or re-express via binning (Relational.rangeJoin) / union+window"))
      case j: BroadcastNestedLoopJoinExec
        if !(oneRowPlan(j.left) || oneRowPlan(j.right)) =>
        // a nested-loop where EITHER side is ONE ROW (a grouping-free
        // global aggregate, or a chain of such crosses) is linear in
        // the other side whatever the condition — the scalar-carrier
        // idiom (grand totals, corpus stats, summary-row assembly,
        // possibly with pushed-down filters as the join condition);
        // only a BNLJ with BOTH sides data-sized is a genuine
        // O(n·m) pair sweep
        Seq(Finding("NESTED_LOOP", j.nodeName,
          "broadcast nested-loop join: every pair evaluated; non-equi " +
            "conditions belong in a binned or as-of/PIT formulation"))
      case s: ShuffleExchangeExec if s.outputPartitioning.numPartitions == 1 =>
        Seq(Finding("SINGLE_PARTITION_EXCHANGE", s.nodeName,
          "exchange to ONE partition mid-plan: all downstream work runs " +
            "in a single task"))
      case f: FileSourceScanExec
        if f.relation.dataSchema.length >= WideScanColumns &&
          f.requiredSchema.length == f.relation.dataSchema.length =>
        Seq(Finding("UNPRUNED_WIDE_SCAN", f.nodeName,
          s"scan reads all ${f.requiredSchema.length} columns of " +
            s"${f.relation.location.rootPaths.headOption.getOrElse("?")}; " +
            "select the needed columns so pruning reaches the scan"))
      case _ => Nil
    }
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Nil // walked via initialPlan above
      case other => (other.children ++ other.subqueries).flatMap(walk)
    }
    here ++ kids
  }
}
