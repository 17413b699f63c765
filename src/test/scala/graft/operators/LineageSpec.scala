package graft.operators

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** The reliable-checkpoint opt-in for iterative operators: setting a
  * checkpoint dir on the SparkContext must switch every
  * [[Lineage.truncate]] call from executor-memory localCheckpoint to
  * durable `df.checkpoint()` — same results, real files on disk, plan
  * truncated to the checkpointed RDD.
  */
class LineageSpec extends SparkSpec {
  import spark.implicits._

  /** Run `body` with a real checkpoint dir configured, then restore the
    * shared session to its no-checkpoint-dir state (the field has no
    * public unset; tests must not leak the dir into other suites). */
  private def withCheckpointDir[T](body: java.io.File => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getCheckpointDir
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toFile
    sc.setCheckpointDir(dir.getAbsolutePath)
    try body(dir)
    finally {
      val m = sc.getClass.getMethods.find(_.getName == "checkpointDir_$eq").get
      m.invoke(sc, prev.map(Option(_)).getOrElse(None))
    }
  }

  // a~b~c~d chain plus an isolated pair: exercises multiple rounds
  private val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
    .toDF("doc_a", "doc_b")

  test("clusterPairs under a checkpoint dir: same labels, durable files, truncated plan") {
    val baseline = Dedup.clusterPairs(pairs)
      .as[(Long, Long)].collect().toSet
    withCheckpointDir { dir =>
      val out = Dedup.clusterPairs(pairs)
      val labeled = out.as[(Long, Long)].collect().toSet
      assert(labeled == baseline, "reliable-checkpoint run diverged from localCheckpoint run")
      assert(labeled == Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (10L, 10L), (11L, 10L)))
      // durable: the rounds actually wrote checkpoint data under the dir
      val rddDirs = Option(dir.listFiles()).getOrElse(Array.empty)
        .flatMap(f => Option(f.listFiles()).getOrElse(Array.empty))
        .filter(_.getName.startsWith("rdd-"))
      assert(rddDirs.nonEmpty, s"no rdd-* checkpoint dirs written under $dir")
      // truncated: the final plan hangs off a checkpointed RDD scan, not
      // the full iterated join tree
      val leaves = out.queryExecution.optimizedPlan.collectLeaves()
      assert(leaves.exists(_.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]),
        s"expected a LogicalRDD leaf (checkpoint), got ${leaves.map(_.nodeName)}")
    }
  }

  test("pageRank is bit-identical with and without a reliable checkpoint dir") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
    val base = graft.graph.PageRank.pageRank(edges, iters = 3)
      .as[(Long, Double)].collect().toMap
    val reliable = withCheckpointDir { _ =>
      graft.graph.PageRank.pageRank(edges, iters = 3)
        .as[(Long, Double)].collect().toMap
    }
    assert(reliable == base)
  }

  test("trainMerges learns the same merges under a reliable checkpoint dir") {
    val docs = Seq("low low lower lowest", "low lower").toDF("text")
    val base = graft.text.Bpe.trainMerges(docs, col("text"), numMerges = 3)
    val reliable = withCheckpointDir { _ =>
      graft.text.Bpe.trainMerges(docs, col("text"), numMerges = 3)
    }
    assert(reliable == base)
  }
}
