package graft


import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — one entry per operator in SURVEY.md §2, with a
  * DuckDB oracle for every SQL-expressible operator. Column aliases and
  * ordering are kept IDENTICAL between the Spark query and its oracle.
  * The registries live in per-domain objects ([[EtlQueries]] A-series,
  * [[KpiQueries]] B, [[RelationalQueries]] C, [[DataQueries]] D) and
  * compose here; key sets are disjoint by the name prefix convention.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("c1_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EtlQueries.queries ++ KpiQueries.queries ++
      RelationalQueries.queries ++ GraphQueries.queries ++ DataQueries.queries ++
      DedupQueries.queries ++ TextQueries.queries ++ VectorQueries.queries ++
      StreamQueries.queries ++ LayoutQueries.queries ++ IngestQueries.queries

  /** DuckDB oracles — identical aliases, identical deterministic
    * ordering. Every query has one (round 1's five `no_oracle` gaps are
    * closed: d2 verifies candidates to the exact-Jaccard set, d3's
    * signatures are md5-derived and recomputed in SQL, d6/d12 use
    * deterministic planes with parameters sized so the LSH result
    * equals the exact set, d13's checksum is sha256 — portable). */
  def oracleSql: Map[String, String] =
    EtlQueries.oracleSql ++ KpiQueries.oracleSql ++
      RelationalQueries.oracleSql ++ GraphQueries.oracleSql ++ DataQueries.oracleSql ++
      DedupQueries.oracleSql ++ TextQueries.oracleSql ++ VectorQueries.oracleSql ++
      StreamQueries.oracleSql ++ LayoutQueries.oracleSql ++ IngestQueries.oracleSql
}
