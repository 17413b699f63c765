package graft

import graft.etl.{Medallion, SchemaCheck}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import java.nio.file.{Files, Paths}

/** JSON source loading with a declared schema (the reference's Bronze
  * layer: raw JSON validated against declared StructTypes —
  * fetch_movies.py:37-45, src/schemas.py). */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL("id BIGINT, title STRING, score DOUBLE")

  private def tmp(): String =
    Files.createTempDirectory("graft-json").resolve("data").toString

  test("readJson applies the declared schema without inference") {
    val dir = tmp()
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(dir, "part-0.json"),
      """{"id": 1, "title": "a", "score": 0.5}
        |{"id": 2, "title": "b", "score": 1.5}
        |""".stripMargin)
    val df = Tables.readJson(spark, dir, schema)
    assert(SchemaCheck.conforms(df.schema, schema))
    assert(df.select(sum("id")).as[Long].head() == 3L)
  }

  test("readJson PERMISSIVE routes malformed records to the corrupt column") {
    val dir = tmp()
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(dir, "part-0.json"),
      """{"id": 1, "title": "ok", "score": 0.5}
        |{"id": "not-a-number", "title": 7}
        |""".stripMargin)
    // Spark disallows queries touching ONLY the corrupt column on raw JSON
    // — collect the parsed rows (id + _raw) and assert on both.
    val rows = Tables.readJson(spark, dir, schema, mode = "PERMISSIVE", corruptColumn = Some("_raw"))
      .select(col("id"), col("_raw")).collect()
    assert(rows.length == 2)
    assert(rows.count(r => !r.isNullAt(1)) == 1) // one malformed record captured
    assert(rows.filter(r => r.isNullAt(1)).map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("readCsv applies the declared schema and routes malformed rows") {
    val dir = tmp()
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(dir, "part-0.csv"),
      """id,title,score
        |1,a,0.5
        |oops,b,not-a-double
        |""".stripMargin)
    val rows = Tables.readCsv(spark, dir, schema, mode = "PERMISSIVE", corruptColumn = Some("_raw"))
      .select(col("id"), col("_raw")).collect()
    assert(rows.length == 2)
    assert(rows.count(r => !r.isNullAt(1)) == 1)
    assert(rows.filter(r => r.isNullAt(1)).map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("readOrc round-trips the declared schema and prunes the projection") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "a", 0.5), (2L, "b", 1.5)).toDF("id", "title", "score")
      .write.orc(dir)
    val back = Tables.readOrc(spark, dir, schema).orderBy("id")
    assert(back.schema == schema)
    assert(back.select("id", "score").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 0.5), (2L, 1.5)))
    // declared sub-schema reads a column subset without touching the rest
    val narrow = org.apache.spark.sql.types.StructType(schema.filter(_.name != "title"))
    assert(Tables.readOrc(spark, dir, narrow).columns.toSeq == Seq("id", "score"))
  }

  test("JSON bronze round-trips through Medallion incremental runner") {
    val bronze = tmp()
    val silver = tmp()
    val p1 = Paths.get(bronze, s"${Medallion.PartitionCol}=2024-01-01")
    Files.createDirectories(p1)
    Files.writeString(p1.resolve("part-0.json"),
      """{"id": 1, "title": "x", "score": 2.0}
        |{"id": 2, "title": "y", "score": 4.0}
        |""".stripMargin)
    val done = Medallion.runIncremental(spark, bronze, silver,
      df => df.withColumn("score2", col("score") * 2),
      read = (s, p) => Tables.readJson(s, p, schema))
    assert(done == Seq("2024-01-01"))
    val out = spark.read.parquet(s"$silver/${Medallion.PartitionCol}=2024-01-01")
    assert(out.select(sum("score2")).as[Double].head() == 12.0)
  }
}
