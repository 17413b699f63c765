package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private val prev = Seq(
    (1L, "alpha", "web"),   // unchanged
    (2L, "beta", "web"),    // changed (text rewritten in cur)
    (3L, "gamma", "web"),   // removed
    (5L, "eps", "book")     // changed (source moves)
  ).toDF("doc_id", "text", "source")

  private val cur = Seq(
    (1L, "alpha", "web"),
    (2L, "beta2", "web"),
    (4L, "delta", "web"),   // added
    (5L, "eps", "wiki")
  ).toDF("doc_id", "text", "source")

  test("classifies added, removed, changed, unchanged") {
    val d = SnapshotDiff.diff(prev, cur, "doc_id", Seq("text", "source"))
    val byKey = d.select("key", "change").as[(Long, String)].collect().toMap
    assert(byKey == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added", 5L -> "changed"))
  }

  test("summarize rolls up per class") {
    val s = SnapshotDiff.summarize(
        SnapshotDiff.diff(prev, cur, "doc_id", Seq("text", "source")))
      .as[(String, Long)].collect().toMap
    assert(s == Map("added" -> 1L, "removed" -> 1L, "changed" -> 2L, "unchanged" -> 1L))
  }

  test("digest over a column subset ignores other columns") {
    val d = SnapshotDiff.diff(prev, cur, "doc_id", Seq("text"))
    val byKey = d.select("key", "change").as[(Long, String)].collect().toMap
    // 5 only changed its source, which the digest no longer covers
    assert(byKey(5L) == "unchanged" && byKey(2L) == "changed")
  }

  test("length prefixes make adjacent columns non-resegmentable") {
    val a = Seq((1L, "ab", "c")).toDF("k", "x", "y")
    val b = Seq((1L, "a", "bc")).toDF("k", "x", "y")
    val d = SnapshotDiff.diff(a, b, "k", Seq("x", "y"))
    assert(d.select("change").as[String].head() == "changed")
  }

  test("null and empty string digest differently") {
    val a = Seq((1L, Option.empty[String])).toDF("k", "x")
    val b = Seq((1L, Option(""))).toDF("k", "x")
    val d = SnapshotDiff.diff(a, b, "k", Seq("x"))
    assert(d.select("change").as[String].head() == "changed")
    // and null vs null is stable
    assert(SnapshotDiff.diff(a, a, "k", Seq("x"))
      .select("change").as[String].head() == "unchanged")
  }

  test("empty prev is all added; empty cur is all removed") {
    val none = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    val allAdded = SnapshotDiff.diff(none, cur, "doc_id", Seq("text", "source"))
    assert(allAdded.count() == 4 &&
      allAdded.filter(col("change") =!= "added").count() == 0)
    val allRemoved = SnapshotDiff.diff(prev, none, "doc_id", Seq("text", "source"))
    assert(allRemoved.count() == 4 &&
      allRemoved.filter(col("change") =!= "removed").count() == 0)
  }

  test("diff against a persisted digest table equals the direct diff") {
    val direct = SnapshotDiff.diff(prev, cur, "doc_id", Seq("text", "source"))
      .select("key", "change").as[(Long, String)].collect().toMap
    val viaTable = SnapshotDiff.diffAgainstDigests(
        SnapshotDiff.digestTable(prev, "doc_id", Seq("text", "source")),
        cur, "doc_id", Seq("text", "source"))
      .select("key", "change").as[(Long, String)].collect().toMap
    assert(viaTable == direct)
  }

  test("plan is one join with no window operators") {
    val d = SnapshotDiff.diff(prev, cur, "doc_id", Seq("text", "source"))
    d.write.format("noop").mode("overwrite").save()
    val exec = d.queryExecution.executedPlan
    assert(exec.collect { case w: WindowExec => w }.isEmpty,
      "snapshot diff must not introduce a window")
  }
}
