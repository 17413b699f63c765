package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MATCH_RECOGNIZE-lite: regex pattern matching over each entity's
  * time-ordered event sequence — the CEP shape (SQL:2016
  * MATCH_RECOGNIZE, Flink CEP) that Spark has no native operator for.
  *
  * Each entity's events become a STRING: every event type maps to one
  * symbol character, events sort by (ts, tieBreak...), and the pattern
  * is an ordinary regex over symbols — `s[vc]*p` = "signup, then any
  * run of views/clicks, then purchase". Counting is non-overlapping
  * leftmost scanning, the same semantics in Java regex and RE2, so
  * results verify across engines as long as the pattern avoids
  * constructs where backtracking (Java) and automaton (RE2) engines
  * diverge — stick to literals, classes, alternation, and greedy
  * quantifiers; no backreferences or lookaround.
  *
  * Event types missing from `symbols` map to `_` rather than being
  * dropped: an unmapped event still BREAKS adjacency (a funnel
  * "signup immediately followed by purchase" must not match across an
  * intervening unmodeled event). Filter upstream to opt out.
  *
  * Scale contract (shared with B15 path mining and C21 funnels): one
  * entity-keyed shuffle carrying only (ts, tieBreak, symbol) structs;
  * each entity's whole sequence materializes in one task, so per-entity
  * event counts must be task-bounded — sessionize first (C10) when
  * entities are unbounded, which also gives the pattern a time scope. */
object SequenceMatch {

  /** One row per entity: `n_events`, the symbol string `seq`,
    * `n_matches` (non-overlapping), and `first_match` (the first
    * matched substring, '' when none). `entityName` names the output
    * entity column. */
  def matchPattern(
      events: DataFrame,
      entity: Column,
      ts: Column,
      eventType: Column,
      symbols: Map[String, String],
      pattern: String,
      tieBreak: Seq[Column] = Nil,
      entityName: String = "entity"): DataFrame = {
    require(symbols.nonEmpty, "symbols map must be non-empty")
    require(symbols.values.forall(s => s.length == 1 && s != "_"),
      s"symbols must be single characters and not the reserved '_', got ${symbols.values}")
    require(symbols.values.toSet.size == symbols.size,
      "symbol characters must be distinct (two event types sharing one symbol is ambiguous)")
    val sym = coalesce(element_at(typedLit(symbols), eventType), lit("_"))
    val ordered = struct((Relational.epochMicros(ts) +: tieBreak :+ sym.as("__sym")): _*)
    events
      .groupBy(entity.as(entityName))
      .agg(array_join(transform(array_sort(collect_list(ordered)),
        e => e.getField("__sym")), "").as("seq"))
      .select(col(entityName),
        length(col("seq")).as("n_events"),
        col("seq"),
        size(regexp_extract_all(col("seq"), lit(pattern), lit(0))).as("n_matches"),
        regexp_extract(col("seq"), pattern, 0).as("first_match"))
  }
}
