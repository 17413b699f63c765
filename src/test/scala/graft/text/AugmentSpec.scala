package graft.text

import graft.{PlanShapes, SparkSpec}
import org.apache.spark.sql.functions._

class AugmentSpec extends SparkSpec {
  import spark.implicits._

  private val sentinelRe = "<extra_id_\\d+>"

  private def corrupt(docs: Seq[(Long, String)], rate: Double = 0.2, span: Int = 3,
      seed: Int = 0) =
    Augment.spanCorrupt(docs.toDF("doc_id", "text"), col("doc_id"), col("text"),
      startRate = rate, spanLen = span, seed = seed)

  /** Replace sentinel k in the input with target span k → original. */
  private def reconstruct(input: String, target: String): String = {
    val spans = target.split(s"(?=$sentinelRe)").filter(_.nonEmpty)
      .map { s =>
        val parts = s.trim.split(" ", 2)
        parts(0) -> (if (parts.length > 1) parts(1) else "")
      }.toMap
    input.split(" ").flatMap { tok =>
      if (tok.matches(sentinelRe)) spans(tok).split(" ").filter(_.nonEmpty).toSeq
      else Seq(tok)
    }.mkString(" ")
  }

  test("reconstruction property: input + target reassemble the original tokens") {
    val rnd = new scala.util.Random(11)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val docs = (1L to 40L).map(i =>
      i -> (0 until (5 + rnd.nextInt(60))).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    val got = corrupt(docs).collect()
    assert(got.length === docs.length)
    got.foreach { r =>
      val docId = r.getAs[Long]("doc_id")
      val norm = docs.find(_._1 == docId).get._2.trim.toLowerCase.replaceAll("\\s+", " ")
      assert(reconstruct(r.getAs[String]("input_text"), r.getAs[String]("target_text")) === norm,
        s"doc $docId failed reconstruction")
      val nSpans = r.getAs[Long]("n_spans")
      assert(sentinelRe.r.findAllIn(r.getAs[String]("input_text")).length === nSpans)
      assert(r.getAs[Long]("n_masked") >= nSpans)
      assert(r.getAs[Long]("n_masked") <= r.getAs[Long]("n_tokens"))
    }
    // with rate 0.2 over 40 docs, masking must actually happen somewhere
    assert(got.map(_.getAs[Long]("n_masked")).sum > 0)
  }

  test("deterministic per seed; different seeds differ") {
    val docs = (1L to 10L).map(i => i -> s"one two three four five six seven eight nine ten")
    val a = corrupt(docs, seed = 1).orderBy("doc_id").collect().map(_.toString).toSeq
    val b = corrupt(docs, seed = 1).orderBy("doc_id").collect().map(_.toString).toSeq
    val c = corrupt(docs, seed = 2).orderBy("doc_id").collect().map(_.toString).toSeq
    assert(a === b)
    assert(a !== c, "a new seed must produce a different corruption epoch")
  }

  test("sentinels are numbered 0..n_spans-1 in order; two window passes, one exchange") {
    val docs = Seq(1L -> ("tok " * 200).trim)
    val out = corrupt(docs, rate = 0.15, span = 2)
    val row = out.head()
    val ids = sentinelRe.r.findAllIn(row.getAs[String]("input_text"))
      .map(s => s.stripPrefix("<extra_id_").stripSuffix(">").toInt).toSeq
    assert(ids === ids.indices.toSeq, s"sentinels out of order: $ids")
    assert(PlanShapes.windowCount(out) === 2)
    assert(PlanShapes.executedShape(out).shuffles <= 2) // grid window + final agg
  }

  test("token-empty documents are absent") {
    val out = corrupt(Seq(1L -> "   ", 2L -> "real words here okay"))
    assert(out.select("doc_id").as[Long].collect().toSeq === Seq(2L))
  }
}
