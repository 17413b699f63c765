package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GopherFilterSpec extends SparkSpec {
  import spark.implicits._

  private def flagsOf(text: String, minWords: Int = 5): Map[String, Boolean] = {
    val row = Seq(text).toDF("text")
      .select(GopherFilter.flags(col("text"), minWords = minWords).as("f"))
      .select("f.*").head()
    row.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> row.getBoolean(i) }.toMap
  }

  test("clean prose passes every gate") {
    val f = flagsOf("the cat and the dog have to be friends with all of that fuss")
    assert(f.values.forall(identity), s"unexpected failures: ${f.filterNot(_._2).keys}")
  }

  test("word-count bounds bind on both ends") {
    assert(!flagsOf("too few", minWords = 5)("ok_word_count"))
    assert(flagsOf("the one and the two have to be here now", minWords = 5)("ok_word_count"))
  }

  test("symbol ratio counts # chars and ellipsis runs") {
    // 6 words, 1 '#' → ratio 1/6 > 0.1 fails; the six-dot run counts twice
    assert(!flagsOf("the cat # and the dog")("ok_symbol_ratio"))
    assert(!flagsOf("the cat and ...... the dog")("ok_symbol_ratio"))
    assert(flagsOf("the cat and the dog have fun")("ok_symbol_ratio"))
  }

  test("alpha-word and stop-word gates") {
    assert(!flagsOf("111 222 333 444 555 the to")("ok_alpha_words")) // 2/7 alpha
    assert(!flagsOf("cats dogs jump high very fast")("ok_stop_words")) // zero stop words
    assert(flagsOf("the dog and the cat ran")("ok_stop_words"))
  }

  test("line rules: bullets and trailing ellipses on raw lines") {
    val bullets = (1 to 10).map(i => s"- item $i of the list").mkString("\n")
    assert(!flagsOf(bullets)("ok_bullet_lines")) // 100% bullet lines > 90%
    val mixed = "- item one\n" + (1 to 9).map(i => s"prose line $i").mkString("\n")
    assert(flagsOf(mixed)("ok_bullet_lines")) // 10% bullets
    val dots = (1 to 10).map(i => s"line $i trails off...").mkString("\n")
    assert(!flagsOf(dots)("ok_ellipsis_lines")) // 100% > 30%
  }

  test("mean word length bounds") {
    assert(!flagsOf("a a a a a a a a")("ok_mean_word_len")) // mean 1 < 3
    assert(!flagsOf("extraordinarily incomprehensible characteristics")("ok_mean_word_len"))
  }
}
