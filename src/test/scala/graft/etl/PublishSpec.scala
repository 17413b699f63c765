package graft.etl

import graft.SparkSpec

class PublishSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-publish").toString + "/table"

  test("publish → readLatest round-trips; versions accumulate; repoint time-travels") {
    val root = freshRoot()
    assert(Publish.currentVersion(spark, root).isEmpty)
    intercept[IllegalStateException] { Publish.readLatest(spark, root) }

    val v1 = Publish.publish(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s"), root)
    assert(v1 == 1L && Publish.currentVersion(spark, root).contains(1L))
    assert(Publish.readLatest(spark, root).count() == 3)

    val v2 = Publish.publish((1L to 5L).map(i => (i, s"x$i")).toDF("k", "s"), root)
    assert(v2 == 2L && Publish.readLatest(spark, root).count() == 5)
    assert(Publish.versions(spark, root) == Seq(1L, 2L))

    Publish.repoint(spark, root, 1L)
    assert(Publish.readLatest(spark, root).count() == 3)
    // publishing after a rollback allocates PAST the rolled-back head
    val v3 = Publish.publish(Seq((9L, "z")).toDF("k", "s"), root)
    assert(v3 == 3L && Publish.readLatest(spark, root).count() == 1)
    intercept[IllegalArgumentException] { Publish.repoint(spark, root, 99L) }
  }

  test("a failed audit never disturbs readers and leaves no staging debris") {
    val root = freshRoot()
    Publish.publish((1L to 5L).map(i => (i, s"x$i")).toDF("k", "s"), root)
    val bad = Seq((1L, null.asInstanceOf[String])).toDF("k", "s")
    val ex = intercept[Publish.AuditFailedException] {
      Publish.publish(bad, root, Seq(
        Checks.NotNull("s"), Checks.RowCountBetween(2L, 100L)))
    }
    assert(ex.failures.size == 2, s"both gates must report: ${ex.failures}")
    // readers still on v1; no v=2 dir, no staging leftovers
    assert(Publish.currentVersion(spark, root).contains(1L))
    assert(Publish.readLatest(spark, root).count() == 5)
    assert(Publish.versions(spark, root) == Seq(1L))
    val leftovers = new java.io.File(root).list().filter(_.startsWith("_staging"))
    assert(leftovers.isEmpty, s"staging not cleaned: ${leftovers.toSeq}")
  }

  test("an orphaned (unpointed) version dir is invisible and never collides") {
    val root = freshRoot()
    Publish.publish(Seq((1L, "a")).toDF("k", "s"), root)
    // simulate a crash between dir-rename and pointer-swap at v=7
    Seq((0L, "orphan")).toDF("k", "s").write.parquet(s"$root/v=7")
    assert(Publish.currentVersion(spark, root).contains(1L))
    assert(Publish.readLatest(spark, root).count() == 1)
    // next publish allocates past the orphan instead of clobbering it
    val v = Publish.publish(Seq((2L, "b"), (3L, "c")).toDF("k", "s"), root)
    assert(v == 8L)
    assert(Publish.readLatest(spark, root).count() == 2)
    assert(Publish.readVersion(spark, root, 7L).count() == 1) // orphan intact
  }
}
