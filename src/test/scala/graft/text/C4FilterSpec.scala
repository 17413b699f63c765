package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class C4FilterSpec extends SparkSpec {
  import spark.implicits._

  private def cleaned(text: String, badWords: Seq[String] = Nil) =
    C4Filter.clean(Seq(text).toDF("text"), col("text"), badWords = badWords)
      .select(col("c4.n_lines"), col("c4.n_kept"), col("c4.clean_text"),
        col("flags.*"))
      .head()

  test("line rule keeps sentence-like lines only") {
    val r = cleaned(
      "This line ends with a period and has many words.\n" +
        "short one\n" +                       // no terminal punct
        "Too few words.\n" +                   // < 5 words
        "Some javascript in this line stays out.\n" + // javascript
        "Does a question count as terminal punctuation? \n" +
        "   \n")                               // blank
    assert(r.getAs[Long]("n_lines") === 5)
    assert(r.getAs[Long]("n_kept") === 2)
    val clean = r.getAs[String]("clean_text")
    assert(clean.startsWith("This line") && clean.contains("question"))
    assert(!clean.contains("javascript") && !clean.contains("short one"))
  }

  test("closing quote after terminal punctuation is terminal") {
    val r = cleaned("He said the words \"stop right there now.\"")
    assert(r.getAs[Long]("n_kept") === 1)
  }

  test("page gates: sentences, lorem ipsum, brace, bad words") {
    val threeSent = "The first sentence is right here today. " +
      "A second sentence follows it closely behind. And here a third one lands."
    assert(cleaned(threeSent).getAs[Boolean]("keep"))
    val twoSent = "Only one sentence sits in this line. And then a second one here."
    assert(!cleaned(twoSent).getAs[Boolean]("ok_sentences"))
    assert(!cleaned(threeSent + "\nWe admire lorem ipsum placeholder text greatly.")
      .getAs[Boolean]("ok_lorem"))
    assert(!cleaned(threeSent + "\nCode with a brace { inside survives the line rule.")
      .getAs[Boolean]("ok_brace"))
    val bad = cleaned(threeSent + "\nThis line regrettably contains badword today.",
      badWords = Seq("badword"))
    assert(!bad.getAs[Boolean]("ok_bad_words") && !bad.getAs[Boolean]("keep"))
  }

  test("gates run on the CLEANED text: junk dropped by the line rule cannot trip them") {
    val threeSent = "The first sentence is right here today. " +
      "A second sentence follows it closely behind. And here a third one lands."
    // brace and lorem lines lack terminal punctuation → removed before gating
    val r = cleaned(threeSent + "\nlorem ipsum { junk\n")
    assert(r.getAs[Boolean]("keep"))
  }

  test("native C4LineClean ≡ HOF reference chain on adversarial inputs") {
    val line = "the quick brown dog runs over the lazy cat today."
    val cases = Seq(
      line,
      "",
      "   ",
      "\n\n\n",
      s"$line\n$line\n$line",
      "ends mid word without punct\nshort.\n" + line,
      "tab\tseparated words make five maybe.",
      "trailing carriage return after period.\r",
      "trailing return no period\r",
      "double return after period.\r\r",
      "quote after punct \"done here with it all.\"",
      "curly quote after punct ends it all now.”",
      "single quote after punct ends it all now.'",
      "quote before punct \"oops\" not terminal",
      "  leading and trailing spaces survive trimming here.  ",
      "JavaScript required to view this page fully.",
      "unicode terminator after period. ",
      "only punctuation . ! ? here now okay.",
      "exactly five words here now.",
      "only four words here.",
      s"$line\r\n$line")  // CRLF: \r survives the \n split
    val df = cases.toDF("text")
    val native = C4Filter.addCleanLines(df, col("text"))
      .select(col("text"), col("c4.n_lines"), col("c4.n_kept"), col("c4.clean_text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val ref = C4Filter.addCleanLinesRef(df, col("text"))
      .select(col("text"), col("c4.n_lines"), col("c4.n_kept"), col("c4.clean_text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    native.zip(ref).foreach { case (n, r) =>
      assert(n == r, s"native/reference diverged on ${n._1.take(60).replace("\n", "\\n")}")
    }
  }

  test("null and empty text clean to empty and fail only the sentence gate") {
    val r = C4Filter.clean(Seq[Option[String]](None, Some("")).toDF("text"), col("text"))
      .select(col("c4.n_lines"), col("flags.ok_sentences"), col("flags.ok_lorem"))
      .collect()
    assert(r.forall(_.getAs[Long]("n_lines") === 0L))
    assert(r.forall(!_.getAs[Boolean]("ok_sentences")))
    assert(r.forall(_.getAs[Boolean]("ok_lorem")))
  }
}
