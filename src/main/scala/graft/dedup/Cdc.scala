package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) — the storage-layer dedup primitive
  * (rsync / LBFS / FastCDC family): split each document at positions
  * where a fingerprint of the trailing `window` characters hits a
  * marker value, so boundaries move WITH the content. A one-character
  * insertion shifts only the chunk it lands in; every chunk after the
  * next content-defined boundary re-aligns and dedups again — the
  * property fixed-size blocking fundamentally lacks, and the reason CDC
  * is how crawl snapshots, model checkpoints, and near-identical
  * document revisions dedup at the byte level (D1 needs EXACT doc
  * equality; D31's span removal needs token grams — CDC sits below
  * both, content-agnostic).
  *
  * Boundary rule (deterministic, engine-mirrorable): position `i` ends
  * a chunk iff `md5(text[i-window+1 .. i])` starts with `marker`
  * ("00" → P(boundary) = 1/256 per position → expected 256-char
  * chunks). The whole computation is codegen'd higher-order functions
  * over the scan — zero shuffle, zero UDF; the chunk table that comes
  * out is the shuffle unit (hash-keyed groupBy downstream). The
  * windowed-md5 fingerprint costs O(window · n) per doc; at a real
  * 100-TB deployment the drop-in upgrade is a native one-pass rolling
  * Gear/Rabin expression (same boundary contract, O(n)) — `window` is
  * a small constant, so this form is the same asymptotic shape.
  *
  * No min/max chunk-length guards: guards make each boundary depend on
  * the previous ACCEPTED boundary (a sequential scan), which buys
  * tighter size bounds at the cost of declarative mirroring; the
  * markerless tail (a doc with no boundary hit) is simply one chunk.
  */
object Cdc {

  /** Chunk table: one row per (id, offset, chunk_len, chunk_hash).
    * Documents with null or empty text contribute no chunks; a doc
    * shorter than `window` (or with no marker hit) is one whole-doc
    * chunk. Offsets are 1-based character positions (substr
    * convention); hashes are md5 hex of the chunk's UTF-8 bytes. */
  def cdcChunks(df: DataFrame, id: Column, text: Column,
      window: Int = 16, marker: String = "00"): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(marker.nonEmpty && marker.length <= 8 &&
      marker.forall(c => c.isDigit || ('a' <= c && c <= 'f')),
      s"marker must be 1-8 lowercase hex chars, got '$marker'")
    val n = length(text)
    val bs = when(n >= window,
        filter(sequence(lit(window), n), i =>
          substring(md5(text.substr(i - lit(window - 1), lit(window)).cast("binary")),
            1, marker.length) === lit(marker)))
      .otherwise(array().cast("array<int>"))
    val ss = concat(array(lit(1)), transform(bs, b => b + 1))
    val es = concat(bs, array(n))
    val pairs = filter(zip_with(ss, es, (a, b) => struct(a.as("s"), b.as("e"))),
      p => p.getField("e") >= p.getField("s"))
    df.filter(text.isNotNull && length(text) > 0)
      .select(id.as("id"), text.as("__cdc_t"), explode(pairs).as("__cdc_c"))
      .select(col("id"),
        col("__cdc_c.s").cast("long").as("offset"),
        (col("__cdc_c.e") - col("__cdc_c.s") + 1).cast("long").as("chunk_len"),
        md5(col("__cdc_t")
          .substr(col("__cdc_c.s"), col("__cdc_c.e") - col("__cdc_c.s") + 1)
          .cast("binary")).as("chunk_hash"))
  }

  /** Production chunker: the native one-pass Gear rolling hash
    * ([[graft.expressions.GearChunks]]) — O(n) per document vs
    * [[cdcChunks]]'s O(window·n) windowed md5, with real min/max chunk
    * guards (a sequential-scan privilege the declarative rule trades
    * away for oracle mirroring), and byte-oriented so the same call
    * chunks text OR binary columns (images, audio, checkpoints).
    * Same output shape as [[cdcChunks]] and composes with
    * [[changeRatio]]/[[dedupRatio]] unchanged — but offsets are 0-based
    * BYTES (not 1-based characters) and the boundary rule differs, so
    * the two chunk tables must never be mixed in one comparison. */
  def cdcChunksRolling(df: DataFrame, id: Column, data: Column,
      minLen: Int = 64, avgBits: Int = 8, maxLen: Int = 1024): DataFrame = {
    import graft.expressions.CdcExpressions.gearChunks
    df.filter(data.isNotNull)
      .select(id.as("id"),
        explode(gearChunks(data, minLen, avgBits, maxLen)).as("__cdc_c"))
      .select(col("id"),
        col("__cdc_c.offset").cast("long").as("offset"),
        col("__cdc_c.len").cast("long").as("chunk_len"),
        col("__cdc_c.hash").as("chunk_hash"))
  }

  /** Per-document revision delta between two [[cdcChunks]] snapshots
    * (the re-crawl question: how much of each page ACTUALLY changed?):
    * for every doc id, the fraction of the AFTER snapshot's bytes not
    * covered by chunks it already had before —
    * `change_ratio = 1 − shared/total_after`, where shared counts each
    * chunk hash at `min(multiplicity_before, multiplicity_after) × len`
    * (a chunk the page repeats 3× but repeated only 2× before shares
    * exactly 2 copies). Because chunk boundaries are content-defined, a
    * one-line edit leaves every re-aligned chunk shared and the ratio
    * near 0 — byte-accurate without any alignment algorithm.
    *
    * Output: one row per doc in either snapshot with `status`
    * (`added` / `deleted` / `changed` / `unchanged`), `total_before`,
    * `total_after`, `shared_chars`, `change_ratio` (null for deleted
    * docs — there is no after to be a fraction of). Plan: two
    * (id, hash) partial aggregates, one co-keyed full-outer join, one
    * id-keyed rollup — all equi-shuffles on (id, hash)/(id). */
  def changeRatio(before: DataFrame, after: DataFrame): DataFrame = {
    def perHash(c: DataFrame, n: String, l: String) =
      c.groupBy(col("id"), col("chunk_hash"))
        .agg(count(lit(1)).as(n), min(col("chunk_len")).as(l))
    val j = perHash(before, "__na", "__la")
      .join(perHash(after, "__nb", "__lb"), Seq("id", "chunk_hash"), "full_outer")
    j.groupBy(col("id"))
      .agg(sum(col("__na") * col("__la")).as("total_before"),
        sum(col("__nb") * col("__lb")).as("total_after"),
        sum(least(coalesce(col("__na"), lit(0L)), coalesce(col("__nb"), lit(0L))) *
          coalesce(col("__la"), col("__lb"))).as("shared_chars"))
      .select(col("id"), col("total_before"), col("total_after"), col("shared_chars"),
        when(col("total_before").isNull, lit("added"))
          .when(col("total_after").isNull, lit("deleted"))
          .when(col("shared_chars") === col("total_after") &&
            col("total_before") === col("total_after"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        when(col("total_after").isNull, lit(null).cast("double"))
          .otherwise(round(lit(1.0) - col("shared_chars") / col("total_after"), 6))
          .as("change_ratio"))
  }

  /** One-row corpus dedup forecast over a [[cdcChunks]] table: total
    * chunk chars, unique chunk chars (each distinct hash counted once),
    * and the savings share a chunk store would realize. Two partial-
    * aggregating passes over the hash key — no distinct-on-driver. */
  def dedupRatio(chunks: DataFrame): DataFrame = {
    val per = chunks.groupBy(col("chunk_hash"))
      .agg(count(lit(1)).as("__n"), min(col("chunk_len")).as("__len"))
    per.agg(sum(col("__n") * col("__len")).as("total_chars"),
        sum(col("__len")).as("unique_chars"))
      .select(col("total_chars"), col("unique_chars"),
        round(lit(1.0) - col("unique_chars") / col("total_chars"), 6)
          .as("dedup_savings"))
  }
}
