package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class EvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("conform widens, nulls missing columns, drops extras, reorders") {
    val batch = Seq((1, "a", 2.5f, "junk")).toDF("id", "name", "score", "legacy")
    val target = StructType(Seq(
      StructField("name", StringType),
      StructField("id", LongType),          // int → long widening
      StructField("score", DoubleType),     // float → double
      StructField("added", StringType)))    // new column, absent in batch
    val out = Evolution.conform(batch, target)
    assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq("name" -> StringType, "id" -> LongType, "score" -> DoubleType, "added" -> StringType))
    val r = out.head()
    assert(r.getString(0) == "a" && r.getLong(1) == 1L && r.getDouble(2) == 2.5 && r.isNullAt(3))
  }

  test("conform refuses lossy narrowing with the field path") {
    val batch = Seq((1L, "a")).toDF("id", "name")
    val target = StructType(Seq(StructField("id", IntegerType), StructField("name", StringType)))
    val e = intercept[IllegalArgumentException] { Evolution.conform(batch, target) }
    assert(e.getMessage.contains("id") && e.getMessage.contains("widening"))
  }

  test("conform recurses into structs and arrays of structs") {
    val batch = spark.createDataFrame(
      java.util.List.of(
        Row(Row(1, "x"), Seq(Row(2), Row(3)), null),
        Row(null, Seq.empty[Row], null)),
      StructType(Seq(
        StructField("meta", StructType(Seq(
          StructField("v", IntegerType), StructField("tag", StringType)))),
        StructField("items", ArrayType(StructType(Seq(StructField("n", IntegerType))))),
        StructField("meta2", StructType(Seq(StructField("v", IntegerType)))))))
    val target = StructType(Seq(
      StructField("meta", StructType(Seq(
        StructField("v", LongType),            // widen inside struct
        StructField("added", StringType)))),   // new nested field
      StructField("items", ArrayType(StructType(Seq(
        StructField("n", LongType), StructField("w", DoubleType)))))))
    val out = Evolution.conform(batch, target)
    val rows = out.collect()
    val m = rows(0).getStruct(0)
    assert(m.getLong(0) == 1L && m.isNullAt(1)) // widened + nulled new field
    val items = rows(0).getSeq[Row](1)
    assert(items.map(_.getLong(0)) == Seq(2L, 3L) && items.forall(_.isNullAt(1)))
    assert(rows(1).isNullAt(0)) // null struct stays null, not struct-of-nulls
  }

  test("readEvolved reconciles mixed parquet generations to the target") {
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    // generation 1: (id int, name)
    Seq((1, "a"), (2, "b")).toDF("id", "name")
      .write.mode("append").parquet(dir)
    // generation 2: (id long, name, score double)
    Seq((3L, "c", 9.5)).toDF("id", "name", "score")
      .write.mode("append").parquet(dir)
    val target = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val out = Evolution.readEvolved(spark, dir, target).orderBy("id")
    assert(out.schema == target)
    val rows = out.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows(0).isNullAt(2) && rows(2).getDouble(2) == 9.5)
  }

  test("decimal precision may grow, scale may not shrink") {
    assert(Evolution.canWiden(DecimalType(10, 2), DecimalType(20, 2)))
    assert(Evolution.canWiden(DecimalType(10, 2), DecimalType(22, 4)))
    assert(!Evolution.canWiden(DecimalType(10, 2), DecimalType(10, 1)))
    assert(!Evolution.canWiden(LongType, DoubleType)) // above 2^53 loses
    assert(Evolution.canWiden(DateType, TimestampType))
  }

  test("schemaDiff classifies added/removed/widened/incompatible with full paths") {
    val old = StructType.fromDDL(
      "id INT, name STRING, ts TIMESTAMP, meta STRUCT<score: FLOAT, tag: STRING>, xs ARRAY<INT>")
    val neu = StructType.fromDDL(
      "id BIGINT, ts STRING, lang STRING, meta STRUCT<score: DOUBLE>, xs ARRAY<LONG>")
    val byPath = Evolution.schemaDiff(old, neu).map(c => c.path -> c).toMap
    assert(byPath("id").kind == "widened")
    assert(byPath("ts").kind == "incompatible") // timestamp → string loses the type
    assert(byPath("name").kind == "removed" && byPath("lang").kind == "added")
    assert(byPath("meta.score").kind == "widened")
    assert(byPath("meta.tag").kind == "removed")
    assert(byPath("xs[]").kind == "widened")
    assert(byPath.size == 7)
    // identical schemas (even reordered) report nothing
    val reordered = StructType(old.fields.reverse)
    assert(Evolution.schemaDiff(old, reordered).isEmpty)
  }

  test("schemaDiff gates exactly what conform would throw on") {
    val old = StructType.fromDDL("a BIGINT, b STRING")
    val narrowed = StructType.fromDDL("a INT, b STRING")
    val widened = StructType.fromDDL("a BIGINT, b STRING, c DOUBLE")
    assert(Evolution.schemaDiff(old, narrowed).exists(_.kind == "incompatible"))
    assert(!Evolution.schemaDiff(old, widened).exists(_.kind == "incompatible"))
    // map key changes are never safe; value changes follow widening
    val m1 = StructType.fromDDL("m MAP<INT, INT>")
    val m2 = StructType.fromDDL("m MAP<STRING, LONG>")
    val changes = Evolution.schemaDiff(m1, m2).map(c => c.path -> c.kind).toMap
    assert(changes("m{key}") == "incompatible" && changes("m{value}") == "widened")
  }
}
