package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** The SQL surface: every native expression must be reachable from
  * `spark.sql(...)` when the session carries
  * `spark.sql.extensions=graft.plans.GraftExtensions`. Runs in a
  * SECOND session on the shared SparkContext so the extension path is
  * exercised exactly as a user's cluster config would.
  */
class SqlFunctionsSpec extends SparkSpec {

  private lazy val ext: SparkSession = {
    spark // force the shared session (and its SparkContext) first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // withExtensions, not the spark.sql.extensions conf: the static conf
    // is read from the (already-running, shared) SparkContext, so only
    // the builder hook can attach extensions to this second session
    try SparkSession.builder()
      .master("local[4]")
      .appName("graft-sql-ext")
      .withExtensions(new GraftExtensions()(_))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "true")
      .getOrCreate()
    finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("graft_dot evaluates natively from SQL") {
    val d = ext.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    assert(d == 11.0)
  }

  test("graft_hyperplane_sigs from SQL matches the Scala column API") {
    import org.apache.spark.sql.functions._
    val fromSql = ext.sql(
      "SELECT graft_hyperplane_sigs(array(0.5d, -1.25d, 2.0d), 4, 8, 3) AS s")
      .collect().head.getSeq[Long](0)
    val fromApi = ext.range(1)
      .select(graft.expressions.VectorExpressions.hyperplaneSigsNative(
        expr("array(0.5d, -1.25d, 2.0d)"), 4, 8, 3).as("s"))
      .collect().head.getSeq[Long](0)
    assert(fromSql == fromApi && fromSql.length == 4)
  }

  test("KLL sketch → union → quantile, all in SQL") {
    ext.range(0, 1000).createOrReplaceTempView("xs")
    val med = ext.sql(
      """WITH parts AS (
        |  SELECT id % 4 AS g, graft_kll_sketch_agg(CAST(id AS DOUBLE), 200) AS sk
        |  FROM xs GROUP BY id % 4)
        |SELECT graft_kll_quantile(graft_kll_union_agg(sk, 200), 0.5d) AS med
        |FROM parts""".stripMargin)
      .collect().head.getDouble(0)
    assert(math.abs(med - 500.0) < 25, s"median estimate $med")
  }

  test("Theta sketch set algebra in SQL") {
    ext.range(0, 600).createOrReplaceTempView("ids")
    // group 0: ids [0, 400); group 1: ids [200, 600) — overlap 200
    val row = ext.sql(
      """WITH sk AS (
        |  SELECT 0 AS g, graft_theta_sketch_agg(id, 14) AS s FROM ids WHERE id < 400
        |  UNION ALL
        |  SELECT 1 AS g, graft_theta_sketch_agg(id, 14) AS s FROM ids WHERE id >= 200)
        |SELECT graft_theta_estimate(a.s, b.s, 'union', 14) AS u,
        |       graft_theta_estimate(a.s, b.s, 'intersect', 14) AS i,
        |       graft_theta_estimate(a.s, b.s, 'diff', 14) AS d
        |FROM sk a JOIN sk b ON a.g = 0 AND b.g = 1""".stripMargin)
      .collect().head
    assert(row.getLong(0) == 600L && row.getLong(1) == 200L && row.getLong(2) == 200L,
      s"got ${row}")
  }

  test("graft_ngram_rep_stats from SQL: [top_chars, dup_chars] per width") {
    // tokens [a b a b]: 2-grams "a b"×2 (3 chars → 6), "b a"×1 → top=6, dup=6;
    // 3-grams "a b a", "b a b" both once → top=5, dup=0
    val row = ext.sql(
      "SELECT graft_ngram_rep_stats(split('a b a b', ' '), 2, 3) AS s").head()
    assert(row.getSeq[Long](0) == Seq(6L, 6L, 5L, 0L), s"got ${row.getSeq[Long](0)}")
  }

  test("graft_c4_line_clean from SQL routes lines and counts") {
    val row = ext.sql(
      """SELECT graft_c4_line_clean(
        |  'This line has the five words needed.\nno punct line\nshort.', 5) AS c""".stripMargin)
      .select("c.n_lines", "c.n_kept", "c.clean_text").head()
    assert(row.getLong(0) == 3L && row.getLong(1) == 1L)
    assert(row.getString(2) == "This line has the five words needed.", s"got $row")
  }

  test("graft_text_normalize from SQL maps unicode and collapses whitespace") {
    val row = ext.sql(
      "SELECT graft_text_normalize('x\u2014y  \u201cz\u201d\u2026  ') AS n").head()
    assert(row.getString(0) == "x-y \"z\"...", s"got $row")
  }

  test("graft_fix_mojibake from SQL repairs a Latin-1 misdecode") {
    val row = ext.sql("SELECT graft_fix_mojibake('CafÃ©') AS f").head()
    assert(row.getString(0) == "Café", s"got $row")
  }

  test("bloom membership state builds and unions from SQL") {
    val bloomDf = ext.sql(
      """SELECT g, graft_bloom_agg(CAST(id AS STRING), 100, 0.01) AS bf
        |FROM (SELECT id, id % 2 AS g FROM range(100)) GROUP BY g""".stripMargin)
    bloomDf.createOrReplaceTempView("blooms")
    val merged = ext.sql(
      "SELECT graft_bloom_union_agg(bf, 100, 0.01) AS bf FROM blooms")
      .head().getAs[Array[Byte]](0)
    // every inserted id is found in the union (no false negatives)
    import graft.expressions.BloomSketch
    val hits = spark.range(100).selectExpr("CAST(id AS STRING) AS v")
      .select(BloomSketch.mightContain(merged, col("v")).as("hit"))
      .collect().count(_.getBoolean(0))
    assert(hits == 100, s"union lost ${100 - hits} members")
  }

  test("graft_cm_agg builds and graft_cm_union_agg merges from SQL") {
    import graft.expressions.CountMin
    val bytes = ext.sql(
      "SELECT graft_cm_union_agg(cm, 5, 2048, 42) FROM " +
        "(SELECT graft_cm_agg(CAST(id % 10 AS STRING), 5, 2048, 42) AS cm " +
        " FROM range(100) GROUP BY id % 4)")
      .head().getAs[Array[Byte]](0)
    assert(CountMin.totalCount(bytes) == 100L)
    val est = ext.range(10).selectExpr("CAST(id AS STRING) AS v")
      .select(CountMin.estimate(bytes, col("v")).as("e"))
      .collect().map(_.getLong(0))
    assert(est.forall(_ >= 10L), s"each of 10 values inserted 10x: ${est.toSeq}")
  }

  test("graft_gear_chunks from SQL tiles and matches the Scala column API") {
    val fromSql = ext.sql(
      "SELECT graft_gear_chunks('abcdefghij', 1, 4, 3) AS c")
      .selectExpr("explode(c) AS e").selectExpr("e.offset", "e.len", "e.hash")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toList
    assert(fromSql.map(_._1) == fromSql.scanLeft(0)((p, c) => p + c._2).init,
      "chunks must tile") // offsets are running sums of lens
    assert(fromSql.map(_._2).sum == 10 && fromSql.forall(_._2 <= 3))
    val fromApi = ext.range(1)
      .select(graft.expressions.CdcExpressions.gearChunks(
        org.apache.spark.sql.functions.lit("abcdefghij"), 1, 4, 3).as("c"))
      .selectExpr("explode(c) AS e").selectExpr("e.offset", "e.len", "e.hash")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toList
    assert(fromSql == fromApi)
  }

  test("config arguments reject non-literals with a clear error") {
    val e = intercept[Exception] {
      ext.sql("SELECT graft_kll_sketch_agg(CAST(id AS DOUBLE), CAST(id AS INT)) FROM range(3)")
        .collect()
    }
    assert(e.getMessage.contains("integer literal"), e.getMessage)
  }

  test("the shared session is NOT polluted by the extension session") {
    val err = intercept[Exception] {
      spark.sql("SELECT graft_dot(array(1.0d), array(1.0d))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("unresolved")
      || err.getMessage.contains("graft_dot"), err.getMessage)
  }
}
