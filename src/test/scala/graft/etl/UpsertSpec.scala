package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private lazy val snapshot = Seq(
    (1L, "a", 1L), (2L, "b", 1L), (3L, "c", 2L))
    .toDF("k", "payload", "v")

  test("upsert: updates override, inserts land, untouched rows survive") {
    val updates = Seq((2L, "b2", 3L), (4L, "d", 1L)).toDF("k", "payload", "v")
    val out = Upsert.upsert(snapshot, updates, Seq("k"), "v")
      .orderBy("k").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "a", 1L), (2L, "b2", 3L), (3L, "c", 2L), (4L, "d", 1L)))
  }

  test("upsert: the batch wins version ties") {
    val updates = Seq((3L, "c-new", 2L)).toDF("k", "payload", "v")
    val out = Upsert.upsert(snapshot, updates, Seq("k"), "v")
      .filter(col("k") === 3L).select("payload").as[String].head()
    assert(out == "c-new")
  }

  test("upsert: a STALE update loses to the snapshot's newer version") {
    val updates = Seq((3L, "c-old", 1L)).toDF("k", "payload", "v")
    val out = Upsert.upsert(snapshot, updates, Seq("k"), "v")
      .filter(col("k") === 3L).select("payload").as[String].head()
    assert(out == "c") // snapshot v=2 beats update v=1
  }

  test("upsert: tombstones delete; null keys are updatable") {
    val snap = Seq((Some(1L), "a", 1L), (None, "n", 1L)).toDF("k", "payload", "v")
    val updates = Seq((Some(1L), "gone", 2L, true), (None, "n2", 2L, false))
      .toDF("k", "payload", "v", "deleted")
    val out = Upsert.upsert(snap, updates, Seq("k"), "v", tombstone = Some("deleted"))
      .select("k", "payload").as[(Option[Long], String)].collect().toSet
    assert(out == Set((None, "n2"))) // k=1 deleted; null key updated once
  }

  test("upsertIncremental equals full upsert; untouched rows avoid the window") {
    val updates = Seq((2L, "b2", 3L), (5L, "e", 1L)).toDF("k", "payload", "v")
    val full = Upsert.upsert(snapshot, updates, Seq("k"), "v")
      .orderBy("k").collect().toSeq
    val inc = Upsert.upsertIncremental(snapshot, updates, Seq("k"), "v")
      .orderBy("k").collect().toSeq
    assert(inc == full)
  }

  test("upsertIncremental handles a snapshot that still carries the tombstone column") {
    val snap = Seq((1L, "a", 1L, false), (2L, "zombie", 1L, true), (3L, "c", 1L, false))
      .toDF("k", "payload", "v", "deleted")
    val updates = Seq((1L, "a2", 2L, false)).toDF("k", "payload", "v", "deleted")
    val out = Upsert.upsertIncremental(snap, updates, Seq("k"), "v", tombstone = Some("deleted"))
      .orderBy("k").select("k", "payload").as[(Long, String)].collect().toSeq
    // untouched branch sheds the column AND its tombstoned rows
    assert(out == Seq((1L, "a2"), (3L, "c")))
  }
}
