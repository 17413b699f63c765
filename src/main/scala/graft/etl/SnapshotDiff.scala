package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch change-data capture between two snapshots of a keyed table:
  * classify every key as added / removed / changed / unchanged by
  * comparing a content digest computed over a chosen column subset.
  *
  * This is the batch sibling of the streaming CDC snapshots
  * ([[graft.streaming.StreamOps]] E9) and the keyed upsert ([[Upsert]]
  * A16): upsert APPLIES a change set, diff RECOVERS one from two
  * materialized snapshots — the primitive behind incremental corpus
  * maintenance ("what did crawl N+1 add, drop, or rewrite vs crawl N"),
  * re-processing only changed documents, and drift audits between
  * pipeline releases.
  *
  * Scale shape: each side is one narrow scan projecting (key, digest) —
  * the digest collapses arbitrarily wide content columns to 32 bytes
  * BEFORE the shuffle, so the full-outer join moves ~48 B/row regardless
  * of document size. The join is a plain equi-join on a unique key
  * (AQE-splittable, no skew surface, no windows); at 100 TB both sides
  * shuffle-partition on the key and nothing else moves. Keys must be
  * unique within each snapshot (the [[graft.text.TfIdf]]-style input
  * contract): duplicate keys would cross-join inside the full-outer
  * join and inflate the diff.
  */
object SnapshotDiff {

  /** Collision-safe content digest over `cols`: every value is
    * length-prefixed (`"<len>:<value>"`) so adjacent columns can never
    * re-segment into the same byte stream — ("ab","c") and ("a","bc")
    * digest differently, as do `null` (the bare `"null"` sentinel,
    * which no length-prefixed value can collide with — those start
    * with a digit) and the empty string (`"0:"`). Unit-separator
    * joined, md5'd. Deterministic and engine-mirrorable (the DuckDB
    * oracle reproduces it with the same CASE/length arithmetic). */
  def digestOf(cols: Seq[Column]): Column = {
    require(cols.nonEmpty, "digestOf needs at least one content column")
    md5(concat_ws("\u001F", cols.map { c =>
      val s = c.cast("string")
      when(s.isNull, lit("null"))
        .otherwise(concat(length(s).cast("string"), lit(":"), s))
    }: _*))
  }

  /** The (key, digest) table of one snapshot. Persist this NEXT TO the
    * snapshot at write time: a later [[diffAgainstDigests]] then reads
    * 48 B/row of the old corpus instead of re-scanning its full text —
    * the difference between a metadata-sized and a corpus-sized job
    * when diffing crawl N+1 against a 100 TB crawl N. */
  def digestTable(df: DataFrame, keyCol: String,
                  contentCols: Seq[String]): DataFrame =
    df.select(col(keyCol).as("key"),
      digestOf(contentCols.map(df(_))).as("digest"))

  /** (key, change, prev_digest, cur_digest) for every key present in
    * either snapshot. `change` is `added` (cur only), `removed` (prev
    * only), `changed` (both, digests differ), `unchanged` (both,
    * digests equal). Content columns are resolved against each side by
    * name. */
  def diff(prev: DataFrame, cur: DataFrame, keyCol: String,
           contentCols: Seq[String]): DataFrame =
    diffAgainstDigests(digestTable(prev, keyCol, contentCols),
      cur, keyCol, contentCols)

  /** [[diff]] where the previous side is an already-materialized
    * digest table ((key, digest) — [[digestTable]]'s shape, or a
    * compacted [[graft.streaming.StreamOps.latestContentState]]): the
    * old snapshot's content is never read. */
  def diffAgainstDigests(prevDigests: DataFrame, cur: DataFrame,
                         keyCol: String, contentCols: Seq[String]): DataFrame = {
    val p = prevDigests.select(col("key"), col("digest").as("prev_digest"))
    val c = digestTable(cur, keyCol, contentCols)
      .withColumnRenamed("digest", "cur_digest")
    p.join(c, Seq("key"), "full_outer")
      .withColumn("change",
        when(col("prev_digest").isNull, lit("added"))
          .when(col("cur_digest").isNull, lit("removed"))
          .when(col("prev_digest") === col("cur_digest"), lit("unchanged"))
          .otherwise(lit("changed")))
  }

  /** Per-class rollup of a [[diff]]: (change, n) — the four-row audit
    * summary a pipeline gates on ("crawl N+1 rewrote 40% of the
    * corpus" is a bug, not an ingest). */
  def summarize(d: DataFrame): DataFrame =
    d.groupBy("change").agg(count(lit(1)).as("n"))
}
