package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IPv4 / CIDR operators for web-crawl governance: blocklist
  * containment ("is this IP inside any listed network?") is a
  * range-containment join with no natural equi key — naively a
  * cartesian against the rule table. Tiling address space onto fixed
  * /`blockBits` blocks turns it into an equi-join: an IP lives in
  * exactly ONE block, a CIDR of prefix ≥ blockBits lives in one block,
  * and a coarser CIDR explodes into its 2^(blockBits−len) covering
  * blocks (bounded — a /8 at blockBits=16 is 256 rows). This scales in
  * BOTH directions: a million-rule table joins a trillion-IP event log
  * key-hashed and AQE-splittable, where the broadcast-the-blocklist
  * shortcut dies the day the rule table outgrows the driver.
  *
  * The block match is necessary-but-not-sufficient, so the exact
  * prefix predicate (ip >> (32−len) == net >> (32−len), computed as
  * overflow-free integer division by 2^(32−len)) verifies each
  * candidate — the C16/C58/D85 bin-then-verify discipline.
  */
object Net {

  /** Dotted-quad string → unsigned-32 as long ("10.1.2.3" → 167838211).
    * Malformed input errors under ANSI (a governance table with junk
    * IPs should fail loudly, not silently drop rules). */
  def ipv4ToLong(ip: Column): Column = {
    val o = split(ip, "\\.")
    element_at(o, 1).cast("long") * 16777216L +
      element_at(o, 2).cast("long") * 65536L +
      element_at(o, 3).cast("long") * 256L +
      element_at(o, 4).cast("long")
  }

  /** All (ip-row, cidr-row) matches where the IPv4 in `ip` is contained
    * in the network in `cidr` ("a.b.c.d/len" notation). Column sets of
    * the two inputs must be disjoint; output is ip columns ++ cidr
    * columns (an IP inside several overlapping rules matches each).
    * CIDRs coarser than /`minPrefix` are rejected (each would explode
    * into > 2^(blockBits−minPrefix) block rows — a /0 rule means "block
    * everything" and deserves a filter, not a join). */
  def cidrContainmentJoin(ips: DataFrame, ip: Column,
                          cidrs: DataFrame, cidr: Column,
                          blockBits: Int = 16, minPrefix: Int = 8): DataFrame = {
    require(blockBits >= 1 && blockBits <= 32, s"blockBits must be in [1,32], got $blockBits")
    require(minPrefix >= 0 && minPrefix <= blockBits,
      s"minPrefix must be in [0,$blockBits], got $minPrefix")
    val dup = ips.columns.toSet.intersect(cidrs.columns.toSet)
    require(dup.isEmpty, s"input column sets must be disjoint, shared: $dup")
    val blockShift = math.pow(2, 32 - blockBits).toLong
    val l = ips
      .withColumn("__ipu", ipv4ToLong(ip))
      .withColumn("__blk", floor(col("__ipu") / blockShift).cast("long"))
    val parts = split(cidr, "/")
    val r0 = cidrs
      .withColumn("__netu", ipv4ToLong(element_at(parts, 1)))
      .withColumn("__len", element_at(parts, 2).cast("int"))
    // loud contract: a too-coarse rule fails the query, not the planner
    val r = r0
      .withColumn("__lenok",
        when(col("__len") >= minPrefix && col("__len") <= 32, col("__len"))
          .otherwise(raise_error(concat(lit(s"cidr prefix outside [$minPrefix,32]: "),
            cidr))))
      .withColumn("__span", pow(lit(2.0), lit(32) - col("__lenok")).cast("long"))
      .withColumn("__blk", explode(sequence(
        floor(col("__netu") / blockShift).cast("long"),
        floor((col("__netu") + col("__span") - 1) / blockShift).cast("long"))))
    val shift = pow(lit(2.0), lit(32) - col("__len")).cast("long")
    l.join(r, l("__blk") === r("__blk") &&
        floor(col("__ipu") / shift) === floor(col("__netu") / shift))
      .drop("__ipu", "__blk", "__netu", "__len", "__lenok", "__span")
  }
}
