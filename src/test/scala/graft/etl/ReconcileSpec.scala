package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  private def table(rows: Seq[(Long, String)]) = rows.toDF("k", "v")
  private val base = (1L to 500L).map(i => (i, s"value-$i"))

  test("identical replicas: zero dirty buckets, empty diff") {
    val a = table(base); val b = table(base)
    val dirty = Reconcile.dirtyBuckets(
      Reconcile.bucketChecksums(a, "k", Seq("v"), 64),
      Reconcile.bucketChecksums(b, "k", Seq("v"), 64))
    assert(dirty.count() == 0)
    assert(Reconcile.reconcile(a, b, "k", Seq("v"), 64).count() == 0)
  }

  test("divergence localizes to its buckets and classifies exactly") {
    val a = table(base)
    // replica b: key 42 changed, key 100 missing, key 9999 extra
    val b = table(base.map { case (k, v) => (k, if (k == 42) "tampered" else v) }
      .filterNot(_._1 == 100L) :+ ((9999L, "extra")))
    val out = Reconcile.reconcile(a, b, "k", Seq("v"), 64).collect()
    val byChange = out.groupBy(_.getAs[String]("change")).view.mapValues(_.map(_.getAs[Long]("key")).toSet).toMap
    assert(byChange("changed") == Set(42L))
    assert(byChange("removed") == Set(100L))
    assert(byChange("added") == Set(9999L))
    val stats = out.head
    val nDirty = stats.getAs[Long]("n_dirty_buckets")
    assert(nDirty >= 1 && nDirty <= 3, s"≤ 3 touched buckets, got $nDirty")
    assert(stats.getAs[Long]("n_buckets") == 64L)
  }

  test("a key-content swap between two rows dirties its buckets (key is in the digest)") {
    val a = table(Seq((1L, "alpha"), (2L, "beta")))
    val b = table(Seq((1L, "beta"), (2L, "alpha")))
    val out = Reconcile.reconcile(a, b, "k", Seq("v"), 4)
    assert(out.filter(col("change") === "changed").count() == 2)
  }

  test("reconcile matches the full SnapshotDiff answer") {
    val a = table(base)
    val b = table(base.map { case (k, v) => (k, if (k % 97 == 0) v + "!" else v) })
    val viaBuckets = Reconcile.reconcile(a, b, "k", Seq("v"), 32)
      .select("key", "change").as[(Long, String)].collect().toSet
    val full = SnapshotDiff.diff(a, b, "k", Seq("v"))
      .filter(col("change") =!= "unchanged")
      .select("key", "change").as[(Long, String)].collect().toSet
    assert(viaBuckets == full)
  }
}
