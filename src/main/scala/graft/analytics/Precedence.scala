package graft.analytics

import graft.operators.{Lineage, Relational}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered co-occurrence (precedence-pair) mining: for every ordered
  * pair of event types (a, b), in how many baskets (sessions, user-days,
  * case files) does `a` occur STRICTLY BEFORE some occurrence of `b`?
  * The temporal-association complement of the other two sequence views:
  * [[Basket]] counts unordered co-presence (no time), B15's path mining
  * counts CONTIGUOUS n-grams (gaps break a path) — precedence pairs
  * tolerate any gap, which is what "signup eventually precedes purchase"
  * questions actually ask (reference origin: analytics/kpis.py's
  * single-event frequency tables stop short of any joint).
  *
  * The pair (a, b) holds in a basket iff min_ts(a) < max_ts(b) there, so
  * the corpus collapses to one row per (basket, type) carrying just
  * (first_ts, last_ts) — a partial-aggregating shuffle that absorbs
  * duplicate events map-side — then to one ARRAY per basket, bounded by
  * the type VOCABULARY (schema-bounded, not data-bounded: a 10^6-event
  * bot session still yields ≤ |vocab| entries, so the mega-basket hazard
  * that forces [[Basket]]'s `maxBasketSize` cap cannot arise). Pair
  * generation is a codegen'd higher-order sweep over that array — never
  * a self-join, which would either re-scan the corpus per side (column
  * pruning specializes each side's aggregate, defeating exchange reuse)
  * or sort-merge the full basket table twice. One extra array row per
  * basket (the null-typed marker — types are null-filtered upstream, so
  * null cannot collide with a real type) rides the SAME explode and
  * counts baskets in the SAME aggregation; the vocab²-row result is
  * lineage-truncated once and split into pair counts and the share
  * denominator. Total: ONE corpus scan, three shuffles, no window.
  *
  * Equal timestamps do NOT count as precedence (strict `<`): "same
  * instant" is not "before", which keeps the answer insensitive to
  * intra-timestamp event ordering.
  */
object Precedence {

  /** One row per ordered type pair (a, b) with `support` = number of
    * baskets where a strictly precedes some b, and `share` = support /
    * total baskets (baskets with ≥1 valid event). Rows with a null
    * basket, type, or timestamp are excluded (they can't witness an
    * ordering). Self-pairs (a = a) are excluded by contract — "a before
    * another a" is repetition, D22's business. Eager (the pair table is
    * materialized once via [[Lineage.truncate]]). */
  def precedencePairs(df: DataFrame, basket: Column, eventType: Column,
      ts: Column, minSupport: Long = 1L): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val us = Relational.epochMicros(ts)
    val pt = df.filter(basket.isNotNull && eventType.isNotNull && ts.isNotNull)
      .groupBy(basket.as("__pp_b"), eventType.as("__pp_t"))
      .agg(min(us).as("__pp_f"), max(us).as("__pp_l"))
    val perBasket = pt.groupBy(col("__pp_b"))
      .agg(collect_list(struct(col("__pp_t").as("t"), col("__pp_f").as("f"),
        col("__pp_l").as("l"))).as("__pp_arr"))
    val pairs = flatten(transform(col("__pp_arr"), x =>
      transform(
        filter(col("__pp_arr"), y =>
          x.getField("t") =!= y.getField("t") && x.getField("f") < y.getField("l")),
        y => struct(x.getField("t").as("a"), y.getField("t").as("b")))))
    val marker = array(struct(lit(null).cast("string").as("a"),
      lit(null).cast("string").as("b")))
    val counts = Lineage.truncate(
      perBasket.select(explode(concat(pairs, marker)).as("__pp_p"))
        .groupBy(col("__pp_p.a").as("a"), col("__pp_p.b").as("b"))
        .agg(count(lit(1)).as("support")))
    val total = counts.filter(col("a").isNull)
      .select(col("support").as("__pp_nb"))
    counts.filter(col("a").isNotNull && col("support") >= minSupport)
      .crossJoin(broadcast(total))
      .select(col("a"), col("b"), col("support"),
        round(col("support") / col("__pp_nb"), 6).as("share"))
  }
}
