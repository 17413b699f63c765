package graft

import org.apache.spark.sql.execution.FileSourceScanExec

/** Scan-discipline regression net, companion to PlanSpec: at 100 TB the
  * difference between a query that works and one that doesn't is often
  * whether its filters and projections reached the parquet scan. These
  * tests pin that for representative queries, so a refactor that breaks
  * pushdown (e.g. wrapping a column in an opaque expression before the
  * filter) fails CI even though sf0.01 rows still match.
  */
class ScanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def scans(name: String): Seq[FileSourceScanExec] = {
    val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan match {
      // AQE wraps the physical plan; scans live under the inner plan
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case s: FileSourceScanExec => s }
  }

  test("a9_project prunes the orders scan to exactly the consumed columns") {
    val read = scans("a9_project").flatMap(_.requiredSchema.fieldNames).toSet
    assert(read == Set("o_orderkey", "o_totalprice", "o_orderstatus", "o_orderdate"),
      s"scan reads $read — projection did not prune")
  }

  test("b3_search_multi pushes its contains-predicates into the parquet scan") {
    val pushed = scans("b3_search_multi").flatMap(_.metadata.get("PushedFilters")).mkString
    assert(pushed.contains("StringContains(p_name,re)"), s"got: $pushed")
    assert(pushed.contains("StringContains(p_type,AN)"), s"got: $pushed")
  }

  test("c1_pricing_summary reads only the six aggregated lineitem columns") {
    val read = scans("c1_pricing_summary").flatMap(_.requiredSchema.fieldNames).toSet
    // shipdate (filter) + flags (keys) + quantity/price/discount (measures)
    assert(read.size <= 7 && read.contains("l_shipdate") && read.contains("l_quantity"),
      s"scan reads $read")
    val pushed = scans("c1_pricing_summary").flatMap(_.metadata.get("PushedFilters")).mkString
    assert(pushed.contains("l_shipdate"), s"ship-date filter not pushed: $pushed")
  }

  test("c3_star_join pushes the region filter and prunes every dimension scan") {
    val all = scans("c3_star_join")
    val regionScan = all.find(_.requiredSchema.fieldNames.contains("r_name")).get
    assert(regionScan.metadata("PushedFilters").contains("EqualTo(r_name,"),
      s"region predicate not pushed: ${regionScan.metadata("PushedFilters")}")
    // no star-join scan reads a table's full width
    all.foreach { s =>
      assert(s.requiredSchema.fieldNames.length <= 4,
        s"scan reads ${s.requiredSchema.fieldNames.mkString(",")} — dimension not pruned")
    }
  }
}
