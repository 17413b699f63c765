package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension maintenance — the dimension half of
  * the medallion Silver layer that append-only cleaning (the reference's
  * clean_transform.py Hive-partitioned appends) does not cover: tracked
  * attributes get one row PER VERSION with a validity interval, so facts
  * can join the dimension as-of their event time ([[graft.operators
  * .Relational]]'s as-of join) instead of seeing only today's state.
  *
  * Versions are derived from a CHANGE LOG (one row per observation of a
  * key's attributes): consecutive observations with identical attribute
  * state collapse into one interval; `valid_to` is the next version's
  * `valid_from` (null = open / current).
  */
object Scd {

  private val Reserved = Seq("__chg", "valid_from", "valid_to", "is_current")

  /** The output owns `valid_from`/`valid_to`/`is_current` (and `__chg`
    * internally): none may name a key/attribute/tie-break column, and
    * the ts column may not collide with the two generated interval
    * columns (`tsCol == "valid_from"` is fine — it is that column). */
  private def checkNames(keyCols: Seq[String], attrCols: Seq[String],
      tsCol: String, tieBreak: Seq[String]): Unit = {
    val roles = keyCols ++ attrCols ++ tieBreak
    Reserved.foreach(c => require(!roles.contains(c),
      s"key/attribute/tie-break columns may not use reserved name $c"))
    Seq("__chg", "valid_to", "is_current").foreach(c => require(tsCol != c,
      s"ts column may not use reserved name $c"))
  }

  /** Build the SCD2 dimension from a change log. `keyCols` identify the
    * entity, `attrCols` are the tracked attributes, `tsCol` (any
    * orderable type; kept as `valid_from`) orders observations, and
    * `tieBreak` columns make same-timestamp observations deterministic.
    * Output: keyCols ++ attrCols ++ (valid_from, valid_to, is_current).
    *
    * Scale: ONE shuffle on the key. The change-detection window and the
    * interval window run over the same (key, order) partitioning, and
    * the interleaved filter preserves distribution and sort, so Catalyst
    * plans a single exchange with no second sort. State comparison is
    * null-safe (`<=>` on a struct of the attributes). */
  def fromChangeLog(
      df: DataFrame,
      keyCols: Seq[String],
      attrCols: Seq[String],
      tsCol: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "need at least one key and one attribute column")
    checkNames(keyCols, attrCols, tsCol, tieBreak)
    val order = (tsCol +: tieBreak).map(col)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    val state = struct(attrCols.map(col): _*)
    val changes = df
      .select((keyCols ++ attrCols :+ tsCol).map(col) ++ tieBreak.map(col): _*)
      .withColumn("__chg", !(state <=> lag(state, 1).over(w)))
      .filter(col("__chg")) // lag null on the first row → <=> false → kept
    // post-filter rows keep the (key, order) distribution and sort, so
    // this second window reuses the first one's exchange
    changes
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols ++ attrCols).map(col) :+ col(tsCol).as("valid_from")
        :+ col("valid_to") :+ col("is_current"): _*)
  }

  /** Merge a batch of new observations into an existing SCD2 dimension
    * (the output shape of [[fromChangeLog]]): versions of keys touched
    * by the batch are re-derived from (their existing versions' change
    * points ∪ the batch), everything else passes through UNTOUCHED.
    * An observation equal to a key's current state is a no-op; a
    * late-arriving observation interleaves against the RECORDED
    * versions (its interval closes at the next known change point).
    * For forward-arriving batches this merge provably equals a
    * one-shot [[fromChangeLog]] over the combined log (EquivalenceSpec);
    * for a batch row landing INSIDE an existing interval, the collapsed
    * duplicate observations of that interval are — inherently to SCD2
    * state — no longer visible, so a re-observation of the old state
    * later in the run is not re-derived.
    *
    * Scale: the batch's key set is the only thing joined against the
    * dimension (left-semi / left-anti on the key), so a daily batch
    * touching 0.1% of keys re-windows 0.1% of the dimension — the rest
    * is a pass-through scan with no shuffle.
    *
    * Ordering inside a rebuilt key is by `tsCol` alone (existing
    * versions carry no tie-break columns): observations must be unique
    * per (key, ts) — true of any valid SCD dimension, and a batch
    * observation timestamped exactly at an existing `valid_from` is
    * ambiguous by construction. */
  def applyUpdates(
      dim: DataFrame,
      updates: DataFrame,
      keyCols: Seq[String],
      attrCols: Seq[String],
      tsCol: String): DataFrame = {
    val keys = updates.select(keyCols.map(col): _*).distinct()
    // null-safe key match: Window.partitionBy groups null keys, so a
    // dimension CAN hold null-key versions — a plain equi-semi/anti
    // would route them to `untouched` while the batch re-windows its
    // null-key observations alone, emitting two open versions
    val cond = keyCols.map(k => dim(k) <=> keys(k)).reduce(_ && _)
    val affected = dim.join(keys, cond, "left_semi")
    val untouched = dim.join(keys, cond, "left_anti")
    // an existing version row IS its change point: (key, attrs, valid_from)
    val logCols = keyCols ++ attrCols :+ tsCol
    val affectedLog = affected.select(keyCols.map(col) ++ attrCols.map(col)
      :+ col("valid_from").as(tsCol): _*)
    val batchLog = updates.select(logCols.map(col): _*)
    val rebuilt = fromChangeLog(affectedLog.unionByName(batchLog), keyCols, attrCols, tsCol)
    untouched.unionByName(rebuilt)
  }
}
