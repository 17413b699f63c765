package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NetSpec extends SparkSpec {
  import spark.implicits._

  test("ipv4ToLong: known values") {
    val got = Seq("0.0.0.0", "10.1.2.3", "255.255.255.255", "192.168.0.1")
      .toDF("ip").select(Net.ipv4ToLong(col("ip"))).as[Long].collect().toSeq
    assert(got === Seq(0L, 167838211L, 4294967295L, 3232235521L))
  }

  test("cidrContainmentJoin equals brute-force bit containment, each match exactly once") {
    val ips = (1 to 200).map { i =>
      (i.toLong, s"10.${(i * 3) % 40}.${(i * 7) % 256}.${(i * 11) % 256}")
    }
    val rules = Seq("10.0.0.0/12", "10.16.0.0/13", "10.5.0.0/16",
      "10.33.128.0/17", "10.8.64.0/18")
    def u32(ip: String): Long = {
      val o = ip.split("\\.").map(_.toLong); (o(0) << 24) | (o(1) << 16) | (o(2) << 8) | o(3)
    }
    val got = Net.cidrContainmentJoin(
        ips.toDF("id", "ip"), col("ip"), rules.toDF("cidr"), col("cidr"))
      .select("id", "cidr").as[(Long, String)].collect().sorted.toSeq
    val want = (for {
      (id, ip) <- ips; c <- rules
      Array(net, len) = c.split("/")
      sh = 32 - len.toInt
      if (u32(ip) >> sh) == (u32(net) >> sh)
    } yield (id, c)).sorted
    assert(want.nonEmpty && got === want) // Seq equality proves exactly-once
  }

  test("overlapping rules each match; prefix coarser than minPrefix fails loudly") {
    val ips = Seq((1L, "10.2.3.4")).toDF("id", "ip")
    val rules = Seq("10.0.0.0/8", "10.2.0.0/16").toDF("cidr")
    val both = Net.cidrContainmentJoin(ips, col("ip"), rules, col("cidr"))
      .select("cidr").as[String].collect().sorted.toSeq
    assert(both === Seq("10.0.0.0/8", "10.2.0.0/16"))
    val tooCoarse = Net.cidrContainmentJoin(ips, col("ip"),
      Seq("10.0.0.0/4").toDF("cidr"), col("cidr"))
    intercept[Exception](tooCoarse.collect())
  }

  test("the join is an equi-join on the block — never a cartesian/nested-loop") {
    val ips = spark.range(500).select(col("id"),
      concat_ws(".", lit(10), pmod(col("id"), lit(40)), lit(1), lit(1)).as("ip"))
    val rules = spark.range(30)
      .select(format_string("10.%d.0.0/16", col("id")).as("cidr"))
    val df = Net.cidrContainmentJoin(ips, col("ip"), rules, col("cidr"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"cidr join degenerated to an unbounded join:\n$plan")
  }
}
