package graft.similarity

import graft.SparkSpec
import graft.vectors.VectorOps
import org.apache.spark.sql.functions._

class AnnSpec extends SparkSpec {
  import spark.implicits._

  // 0 and 1 identical; 2 orthogonal to them; 3 close to 0/1.
  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (3L, Array(0.9f, 0.1f, 0.0f, 0.0f)))
    .toDF("vec_id", "embedding")

  test("VectorOps: dot, norm, cosine in double precision") {
    val df = Seq((Array(3.0f, 4.0f), Array(1.0f, 0.0f))).toDF("a", "b")
    val r = df.select(
      VectorOps.dot(VectorOps.toDouble(col("a")), VectorOps.toDouble(col("b"))).as("d"),
      VectorOps.l2Norm(VectorOps.toDouble(col("a"))).as("n")).head()
    assert(r.getDouble(0) == 3.0 && r.getDouble(1) == 5.0)
  }

  test("bruteForceTopK: identical vector ranks first with cosine 1") {
    val out = Ann.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0), "vec_id", "embedding", k = 3)
      .orderBy("rank").collect()
    assert(out.head.getLong(1) == 1L && out.head.getDouble(2) == 1.0)
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 3L, 2L)) // by cosine desc
  }

  test("lshTopK finds identical vectors (all buckets collide)") {
    val out = Ann.lshTopK(vecs, vecs.filter(col("vec_id") === 0), "vec_id", "embedding",
      dims = 4, k = 3, tables = 4, bits = 2)
    val top = out.orderBy("rank").collect()
    assert(top.nonEmpty && top.head.getLong(1) == 1L && top.head.getDouble(2) == 1.0)
  }

  test("embeddingNearDupPairs surfaces the identical pair at cosine 1") {
    val pairs = Ann.embeddingNearDupPairs(vecs, "vec_id", "embedding",
      dims = 4, threshold = 0.99, tables = 4, bits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.contains((0L, 1L, 1.0)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("lsh signatures are deterministic across invocations") {
    val s1 = vecs.select(Ann.hyperplaneSignature(VectorOps.toDouble(col("embedding")), 4, 0, 8).as("s"))
      .as[String].collect().toSeq
    val s2 = vecs.select(Ann.hyperplaneSignature(VectorOps.toDouble(col("embedding")), 4, 0, 8).as("s"))
      .as[String].collect().toSeq
    assert(s1 == s2)
  }
}
