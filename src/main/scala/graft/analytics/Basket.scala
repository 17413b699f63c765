package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence analysis — support / confidence / lift
  * over (basket, item) pairs: "parts ordered together", "events
  * co-occurring in a session", "tags co-applied to a document". The
  * association-rule core the reference's per-group KPI tables stop
  * short of (kpis.py aggregates single dimensions; lift needs the
  * joint).
  *
  * Plan shape at scale: distinct (basket, item) collapse first
  * (partial-aggregating — repeat purchases don't inflate the joint),
  * then pair generation by a basket-keyed self-join whose fan-out is
  * C(k, 2) per basket. The Zipf hazard is the MEGA-BASKET (one bot
  * session with 10^5 items → 5·10^9 pairs on one key), handled the A20
  * way: baskets above `maxBasketSize` are dropped BEFORE pairing, by
  * contract — a 10^5-item basket carries no signal about pairwise
  * affinity anyway. Item marginals join back on the item key; the
  * basket total rides in as a one-row broadcast scalar carrier. No
  * windows anywhere.
  */
object Basket {

  /** Canonical co-occurrence pairs (item_a < item_b) with joint count,
    * support, both directional confidences, and lift
    * (`N·n_ab / (n_a·n_b)`; > 1 = positively associated). Counts and
    * marginals are over baskets SURVIVING the size cap; pairs below
    * `minSupport` joint baskets are dropped (noise floor — a pair seen
    * once proves nothing and the pair table stays bounded). */
  def coOccurrence(
      df: DataFrame,
      basket: Column,
      item: Column,
      minSupport: Long = 2,
      maxBasketSize: Int = 1000): DataFrame = {
    require(minSupport >= 1 && maxBasketSize >= 2)
    val bi = df.filter(basket.isNotNull && item.isNotNull)
      .select(basket.as("__b"), item.as("__i")).distinct()
    val sized = bi.groupBy(col("__b")).agg(count(lit(1)).as("__sz"))
      .filter(col("__sz") <= maxBasketSize)
    val kept = bi.join(sized, Seq("__b")).select(col("__b"), col("__i"))
    val nBaskets = kept.groupBy(col("__b")).agg(lit(1).as("__one"))
      .agg(count(lit(1)).as("__n_baskets"))
    val marginals = kept.groupBy(col("__i")).agg(count(lit(1)).as("__n_item"))
    val pairs = kept.select(col("__b"), col("__i").as("item_a"))
      .join(kept.select(col("__b"), col("__i").as("item_b")), Seq("__b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_joint"))
      .filter(col("n_joint") >= minSupport)
    pairs
      .join(marginals.select(col("__i").as("item_a"), col("__n_item").as("n_a")), "item_a")
      .join(marginals.select(col("__i").as("item_b"), col("__n_item").as("n_b")), "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(
        col("item_a"), col("item_b"), col("n_joint"),
        col("n_a"), col("n_b"),
        (col("n_joint") / col("__n_baskets")).as("support"),
        (col("n_joint") / col("n_a")).as("conf_a_to_b"),
        (col("n_joint") / col("n_b")).as("conf_b_to_a"),
        (col("n_joint") * col("__n_baskets") / (col("n_a") * col("n_b"))).as("lift"))
  }
}
