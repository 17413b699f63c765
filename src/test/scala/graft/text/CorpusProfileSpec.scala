package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusProfileSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    // en: stopwords 'the','of'; 10 chars incl caps/punct vary
    (1L, "the rain of spain", "web"),
    (2L, "the rain of spain", "web"),      // exact dup of 1
    (3L, "der der und das", "books"),      // de; one stutter pair ("der der")
    (4L, "el que la y", "web"))            // es
    .toDF("doc_id", "text", "source")

  test("profile computes the corpus card in one row, hand-checked") {
    val r = CorpusProfile.profile(docs, col("text"), col("source")).head()
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("n_sources") == 2L)
    assert(r.getAs[Long]("n_tokens") == 4 + 4 + 4 + 4)
    assert(r.getAs[Long]("n_chars") == 17 + 17 + 15 + 11)
    assert(r.getAs[Long]("n_exact_dup_docs") == 1L) // doc 2 repeats doc 1
    assert(r.getAs[Long]("n_stutter_tokens") == 1L) // "der der" collapses one
    assert(r.getAs[Long]("n_en") == 2L && r.getAs[Long]("n_de") == 1L &&
      r.getAs[Long]("n_es") == 1L && r.getAs[Long]("n_fr") == 0L)
    val q = r.getAs[Double]("avg_quality")
    assert(q > 0.0 && q <= 1.0)
  }

  test("sketchCards merged over arbitrary slices reproduce the one-pass card") {
    val docs500 = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val direct = CorpusProfile.profile(docs500, col("text"), col("source")).head()
    val cards = CorpusProfile.sketchCards(docs500, col("text"), col("source"),
      slice = pmod(col("doc_id"), lit(3))) // 3 arbitrary slices
    assert(cards.count() == 3)
    val rolled = CorpusProfile.rollupCards(cards).head()
    // exact-mergeable fields agree exactly with the single-pass card
    Seq("n_docs", "n_tokens", "n_chars", "n_stutter_tokens", "n_en", "n_de", "n_es", "n_fr")
      .foreach(f => assert(rolled.getAs[Long](f) == direct.getAs[Long](f), f))
    assert(math.abs(rolled.getAs[Double]("avg_quality") - direct.getAs[Double]("avg_quality")) <= 0.0001)
    // the HLL distinct-doc estimate lands within its documented ±~5%
    val exactDistinct = direct.getAs[Long]("n_docs") - direct.getAs[Long]("n_exact_dup_docs")
    val est = rolled.getAs[Long]("n_distinct_docs_est").toDouble
    assert(math.abs(est - exactDistinct) <= 0.05 * exactDistinct,
      s"HLL estimate $est vs exact $exactDistinct")
    // KLL quantiles are within rank error: the p50 estimate's true rank
    // sits in [0.5 ± 2%] — cheap proxy: it lies within the quality range
    val q50 = rolled.getAs[Double]("q50")
    assert(q50 > 0.0 && q50 <= 1.0 && rolled.getAs[Double]("q95") >= q50)
  }

  test("the whole card costs ONE corpus scan (expand included)") {
    val df = CorpusProfile.profile(docs, col("text"), col("source"))
    val parquetDocs = {
      val dir = java.nio.file.Files.createTempDirectory("graft-profile").toString
      docs.write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
    }
    val q = CorpusProfile.profile(parquetDocs, col("text"), col("source"))
    q.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => 0
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(s.plan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => scans(a.executedPlan)
      case _: org.apache.spark.sql.execution.FileSourceScanExec => 1
      case other => (other.children ++ other.subqueries).map(scans).sum
    }
    assert(scans(q.queryExecution.executedPlan) == 1,
      "corpus card must be a single-pass aggregate")
    assert(df.columns.length == 7 + TextFunctions.LangStopwords.length)
  }
}
