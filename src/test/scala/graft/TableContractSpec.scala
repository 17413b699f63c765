package graft

import graft.operators.Relational
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The single loud tripwire for testdata regeneration drift.
  *
  * The driver regenerates `/root/testdata` between rounds, and physical
  * parquet types have already drifted once (round 7→8: `events.ts` went
  * from TIMESTAMP(NANOS) to TIMESTAMP(MICROS, NTZ), silently breaking
  * five time-based queries and 15 scattered tests). This spec asserts
  * the NORMALIZED schema of every table at every shipped scale factor,
  * so the next silent regeneration fails exactly one named test with a
  * readable diff instead of a constellation of DATATYPE_MISMATCH errors
  * downstream.
  */
class TableContractSpec extends SparkSpec {

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .filter(d => new java.io.File(d).isDirectory)

  private def fieldTypes(df: DataFrame): Map[String, DataType] =
    df.schema.fields.map(f => f.name -> f.dataType).toMap

  test("testdata sf dirs exist") {
    assert(sfDirs.nonEmpty, "no /root/testdata/sf* dirs found")
  }

  for (dir <- sfDirs) {
    test(s"events normalizes ts to session-TZ TimestampType [$dir]") {
      val t = fieldTypes(Tables.events(spark, dir))
      assert(t("ts") == TimestampType,
        s"events.ts must normalize to TIMESTAMP, got ${t("ts")} — " +
          "a new parquet generation needs an arm in Tables.events")
      assert(t("event_id") == LongType && t("user_id") == LongType)
      assert(t("event_type") == StringType && t("value") == DoubleType)
      // the loader must stay total: epoch micros are computable
      assert(Tables.events(spark, dir)
        .select(Relational.epochMicros(col("ts"))).limit(1).count() >= 0)
    }

    test(s"TPC-H-ish tables keep their key/type contract [$dir]") {
      // date columns ship as TIMESTAMP(MICROS, NTZ) in the current
      // generation; queries rely on that (date comparisons coerce), so
      // the contract pins it — a flip to DATE or LTZ must fail HERE
      val li = fieldTypes(Tables.lineitem(spark, dir))
      assert(li("l_orderkey") == LongType && li("l_quantity") == DoubleType &&
        li("l_extendedprice") == DoubleType &&
        Set[DataType](DateType, TimestampNTZType, TimestampType)(li("l_shipdate")),
        s"lineitem drifted: $li")
      val o = fieldTypes(Tables.orders(spark, dir))
      assert(o("o_orderkey") == LongType && o("o_totalprice") == DoubleType &&
        Set[DataType](DateType, TimestampNTZType, TimestampType)(o("o_orderdate")),
        s"orders drifted: $o")
      val c = fieldTypes(Tables.customer(spark, dir))
      assert(c("c_custkey") == LongType && c("c_mktsegment") == StringType,
        s"customer drifted: $c")
      assert(fieldTypes(Tables.part(spark, dir))("p_partkey") == LongType)
      assert(fieldTypes(Tables.supplier(spark, dir))("s_suppkey") == LongType)
      // small-dim keys ship as int32 (and nationkey FKs match them)
      assert(fieldTypes(Tables.nation(spark, dir))("n_nationkey") == IntegerType)
      assert(fieldTypes(Tables.region(spark, dir))("r_regionkey") == IntegerType)
      assert(c("c_nationkey") == IntegerType)
    }

    test(s"documents/embeddings keep their corpus contract [$dir]") {
      val d = fieldTypes(Tables.documents(spark, dir))
      assert(d("doc_id") == LongType && d("text") == StringType &&
        d("lang") == StringType && d("source") == StringType,
        s"documents drifted: $d")
      val e = fieldTypes(Tables.embeddings(spark, dir))
      assert(e.get("vec_id").contains(LongType), s"embeddings drifted: $e")
      assert(e.get("embedding").contains(ArrayType(FloatType, true)),
        s"embeddings needs embedding Array[Float]: $e")
    }
  }

  /** Defense-in-depth check behind the loader: the time operators accept
    * BOTH timestamp flavors directly (a frame that bypassed Tables.events
    * — e.g. a user's own NTZ parquet — must not analysis-fail), and the
    * flavors are result-identical under the UTC session. */
  test("epochMicros and time operators are timestamp-flavor agnostic") {
    import spark.implicits._
    val base = Seq(
      (1L, "2024-01-01 00:00:00", 1.0),
      (1L, "2024-01-01 00:10:00", 2.0),
      (1L, "2024-01-01 01:10:00", 3.0),
      (2L, "2024-01-01 00:00:30", 4.0)
    ).toDF("uid", "ts_s", "v")
    val ltz = base.withColumn("ts", col("ts_s").cast(TimestampType)).drop("ts_s")
    val ntz = base.withColumn("ts", col("ts_s").cast(TimestampNTZType)).drop("ts_s")

    def run(df: DataFrame): (Seq[Long], Seq[(Long, Long, Long)], Seq[Double]) = {
      val us = df.select(Relational.epochMicros(col("ts")).as("us"))
        .as[Long].collect().toSeq.sorted
      val sess = Relational.sessionStats(
          Relational.sessionize(df, col("uid"), col("ts"), 1800, Seq(col("v"))),
          col("uid"))
        .select(col("uid"), col("session_id"), col("n_events"))
        .as[(Long, Long, Long)].collect().toSeq.sorted
      val mov = Relational.movingAgg(df, col("uid"), col("ts"), col("v"), 3600)
        .select(col("moving_avg")).as[Double].collect().toSeq.sorted
      val twap = Relational.timeWeightedAvg(df, col("uid"), col("ts"), col("v"))
        .select(col("twap")).na.drop().as[Double].collect().toSeq.sorted
      (us, sess, mov ++ twap)
    }

    assert(run(ltz) == run(ntz),
      "NTZ and LTZ inputs must produce identical results under a UTC session")
  }
}
