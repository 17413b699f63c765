package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-line language SEGMENTATION: a mixed-language document (quoted
  * passages, code-switched forums, boilerplate in a second language)
  * gets one row per contiguous same-language line run, so a pipeline
  * can route segments instead of misrouting whole documents on the
  * majority label ([[TextFunctions.langId]] is the per-document
  * sibling; same deterministic stopword-hit argmax per line, through
  * the one-pass native hit counter).
  *
  * Plan: lines explode with their position, per-line hits are ONE
  * native expression pass, and run grouping is a per-DOCUMENT window
  * (lag + running sum on line order) — partition size bounded by each
  * document's own line count, never a corpus-frequency key (the
  * plan-discipline window exception). */
object LangSegments {

  /** (doc_id, seg_no, lang, n_lines, start_line) — one row per
    * contiguous same-language run of non-blank lines, seg_no 0-based
    * in document order. */
  def segments(df: DataFrame, id: Column, text: Column): DataFrame = {
    val lines = df
      .select(id.as("doc_id"), posexplode(split(coalesce(text, lit("")), "\n")))
      .filter(length(trim(col("col"))) > 0)
      .select(col("doc_id"), col("pos").as("line_no"),
        TextFunctions.tokens(col("col")).as("__t"))
    val hits = lines.select(
      Seq(col("doc_id"), col("line_no")) ++
        TextFunctions.langHitsOf(col("__t")).map { case (l, c) => c.as(s"__h_$l") }: _*)
    val pred = hits.select(col("doc_id"), col("line_no"),
      TextFunctions.langPred(
        TextFunctions.LangStopwords.map { case (l, _) => l -> col(s"__h_$l") }).as("lang"))
    val w = Window.partitionBy("doc_id").orderBy("line_no")
    pred
      .withColumn("__new",
        when(lag(col("lang"), 1).over(w).isNull ||
          lag(col("lang"), 1).over(w) =!= col("lang"), 1L).otherwise(0L))
      .withColumn("seg_no", sum(col("__new")).over(w) - 1L)
      .groupBy("doc_id", "seg_no")
      .agg(min(col("lang")).as("lang"),
        count(lit(1)).as("n_lines"),
        min(col("line_no")).cast("long").as("start_line"))
  }
}
