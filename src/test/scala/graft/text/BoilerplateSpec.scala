package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private def clean(text: String): (Long, Long, String) = {
    val r = Boilerplate.addCleanLines(Seq(text).toDF("text"), col("text"))
      .select("bl.n_lines", "bl.n_kept", "bl.clean_text").head()
    (r.getLong(0), r.getLong(1), r.getString(2))
  }

  test("navigation crumbs drop, prose survives, order preserved") {
    val text = Seq(
      "Home > Products > Widgets",
      "the widget is a fine product that we have built with care",
      "Accept Cookies",
      "it works with all of the other products in the line").mkString("\n")
    val (n, k, cleaned) = clean(text)
    assert(n == 4L && k == 2L)
    assert(cleaned ==
      "the widget is a fine product that we have built with care\n" +
        "it works with all of the other products in the line")
  }

  test("long lines survive even with zero stopwords") {
    val longLine = "x9 " * 80 // 240 chars, no stopwords
    val (_, k, cleaned) = clean(longLine.trim + "\nMenu")
    assert(k == 1L && cleaned == longLine.trim)
  }

  test("stopword ratio binds: wordy line without function words drops") {
    val noStops = "quick brown foxes jump over lazy sleeping dogs daily"
    assert(clean(noStops)._2 == 0L)
    val withStops = "the quick brown foxes jump over and over with the dogs"
    assert(clean(withStops)._2 == 1L)
  }

  test("blank-only input yields an empty result, not nulls") {
    val (n, k, cleaned) = clean("\n \n")
    assert(n == 0L && k == 0L && cleaned == "")
  }
}
