package graft.etl

import graft.dedup.Dedup
import graft.operators.Lineage
import graft.text.{GopherFilter, GopherRepetition, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The composed pretraining-data cleaning pipeline — the end-to-end
  * shape every LLM corpus build runs, wired from the library's own
  * stages in the published order:
  *
  *   1. GATE: Gopher quality rules ([[graft.text.GopherFilter]]) AND
  *      repetition rules ([[graft.text.GopherRepetition]]) — narrow
  *      maps, composable into the scan;
  *   2. EXACT DEDUP: keep-first on the normalized content fingerprint
  *      (a doc survives iff its id is the minimum of its fingerprint
  *      group — a partial-aggregating `groupBy`, no join-back needed);
  *   3. PARAGRAPH DEDUP: [[graft.dedup.Dedup.paragraphDedup]] across
  *      the exact survivors, reassembling `clean_text`.
  *
  * Plan shape: the flag stage (the expensive part — nine sorted
  * shingle arrays per row) is truncated ONCE and every downstream
  * stage derives from that materialization (single-parent rule);
  * stage survival rides as boolean markers in one per-document frame,
  * so [[summary]] is ONE conditional aggregation — no per-stage
  * re-counting subtrees. All dedup elections are partial-aggregating
  * groupBys on content keys (combiners absorb the boilerplate Zipf
  * head; never a window over a corpus-frequency key).
  */
object PretrainPipeline {

  /** Per-document frame with stage markers: (doc_id, source, text,
    * __gate, __exact, n_paras, n_kept, clean_text). */
  private def enriched(df: DataFrame, id: Column, text: Column, source: Column,
                       minWords: Int): DataFrame = {
    val base = df.select(id.as("doc_id"), source.as("source"),
      coalesce(text, lit("")).as("text"))
    val flagged = Lineage.truncate(
      GopherRepetition.addFlags(
        base.select(col("*"), GopherFilter.flags(col("text"), minWords).as("__q")),
        col("text"), "__r")
        .select(col("doc_id"), col("source"), col("text"),
          (col("__q.keep") && col("__r.keep")).as("__gate")))
    val gated = flagged.filter(col("__gate"))
      .select(col("doc_id"), TextFunctions.contentFingerprint(col("text")).as("__fp"))
    // a doc survives exact dedup iff its id IS the min of its
    // fingerprint group — the winner set needs no join-back
    val exactKeep = gated.groupBy("__fp").agg(min("doc_id").as("doc_id"))
      .select(col("doc_id"), lit(true).as("__exact"))
    val kept = flagged.join(exactKeep, Seq("doc_id"), "left")
      .withColumn("__exact", coalesce(col("__exact"), lit(false)))
    val paras = Dedup.paragraphDedup(
      kept.filter(col("__exact")).select(col("doc_id"), col("text")),
      col("doc_id"), col("text"))
    kept.join(paras, Seq("doc_id"), "left")
      .withColumn("n_paras", coalesce(col("n_paras"), lit(0L)))
      .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
      .withColumn("clean_text", coalesce(col("clean_text"), lit("")))
  }

  /** The cleaned corpus: exact-surviving gated documents with their
    * paragraph-deduplicated `clean_text` (empty when every paragraph
    * was owned elsewhere). (doc_id, source, clean_text, n_paras,
    * n_kept_paras). */
  def clean(df: DataFrame, id: Column, text: Column, source: Column,
            minWords: Int = 50): DataFrame =
    enriched(df, id, text, source, minWords)
      .filter(col("__exact"))
      .select(col("doc_id"), col("source"), col("clean_text"),
        col("n_paras"), col("n_kept").as("n_kept_paras"))

  /** Per-source funnel: input docs → gate survivors → exact-dedup
    * survivors → paragraph counts and final clean token volume. One
    * conditional aggregation over the marker frame; every column an
    * exact integer. */
  def summary(df: DataFrame, id: Column, text: Column, source: Column,
              minWords: Int = 50): DataFrame =
    enriched(df, id, text, source, minWords)
      .withColumn("__tok",
        when(col("__exact") && length(col("clean_text")) > 0,
          TextFunctions.tokenCount(col("clean_text"))).otherwise(lit(0L)))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("__gate"), 1L).otherwise(0L)).as("n_gated"),
        sum(when(col("__exact"), 1L).otherwise(0L)).as("n_exact_kept"),
        sum(when(col("__exact"), col("n_paras")).otherwise(lit(0L))).as("n_paras"),
        sum(when(col("__exact"), col("n_kept")).otherwise(lit(0L))).as("n_kept_paras"),
        sum(col("__tok")).as("n_tokens_clean"))
      .orderBy("source")
}
