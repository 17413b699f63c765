package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Array-of-struct flattening (reference: clean_transform.py:78-113). */
class NestedSpec extends SparkSpec {
  import spark.implicits._

  private val ddl = "genres array<struct<name:string>>, crew array<struct<job:string,name:string>>"
  private val docs = Seq(
    (1L, """{"genres":[{"name":"Action"},{"name":"Drama"}],"crew":[{"job":"Editor","name":"e1"},{"job":"Director","name":"d1"}]}"""),
    (2L, """{"genres":[],"crew":[{"job":"Editor","name":"e2"}]}"""),
    (3L, "not json at all")
  ).toDF("id", "payload")

  private def flat = docs.select(col("id"), Nested.parseJson(col("payload"), ddl).as("p"))

  test("joinField pipe-joins nested names; empty array yields empty string") {
    val out = flat.select(col("id"), Nested.joinField(col("p.genres"), "name").as("g"))
      .orderBy("id").as[(Long, String)].collect()
    assert(out(0) == (1L, "Action|Drama"))
    assert(out(1) == (2L, ""))
    assert(out(2)._2 == null) // malformed JSON → null struct → null
  }

  test("fieldOfFirstWhere extracts the Director regardless of position; none → null") {
    val out = flat.select(col("id"),
        Nested.fieldOfFirstWhere(col("p.crew"), c => c.getField("job") === "Director", "name").as("d"))
      .orderBy("id").as[(Long, String)].collect()
    assert(out(0) == (1L, "d1"))   // Director second in the array
    assert(out(1)._2 == null)      // no Director
    assert(out(2)._2 == null)      // malformed
  }

  test("countOf counts elements, null array counts 0") {
    val out = flat.select(col("id"), Nested.countOf(col("p.genres")).as("n"))
      .orderBy("id").as[(Long, Long)].collect()
    assert(out.map(_._2).toSeq == Seq(2L, 0L, 0L))
  }
}
