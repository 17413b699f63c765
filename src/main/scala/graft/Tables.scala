package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Schema-typed loaders for the driver-generated test tables
  * (`/root/testdata/sf*`; see TESTDATA.md).
  *
  * All loaders are plain parquet scans — column pruning and filter
  * pushdown happen in the caller's plan (verify with
  * `.explain("formatted")` → `ReadSchema` / `PushedFilters`).
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * cannot represent natively. Sessions must set
    * `spark.sql.legacy.parquet.nanosAsLong=true` AT CONSTRUCTION (done in
    * Bench/Verify/test builders) so nanos arrive as LONG; this loader then
    * rebuilds a microsecond TimestampType column with integer division (a
    * double division would lose precision above 2^53 ns). The flag is
    * deliberately NOT set here — mutating shared session config inside a
    * loader is a hidden side effect and race-prone across concurrent
    * queries. Narrow map — no shuffle.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _        => raw
    }
  }
}
