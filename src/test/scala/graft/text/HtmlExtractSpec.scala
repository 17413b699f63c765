package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(HtmlExtract.extractText(col("h")).as("t"))
      .head().getString(0)

  test("full page: chrome dropped, block structure becomes lines") {
    val html =
      """<html><head><title>Ignored</title><style>p{color:red}</style></head>
        |<body><nav><ul><li><a href="/">Home</a></li><li><a href="/a">About</a></li></ul></nav>
        |<h1>Heading</h1>
        |<p>First paragraph with <b>bold</b> text.</p>
        |<script type="text/javascript">var x = 1 < 2 && "</p>";</script>
        |<!-- a comment with <p>markup</p> inside -->
        |<div>Second   block</div></body></html>""".stripMargin
    assert(extract(html) ==
      "Home\nAbout\nHeading\nFirst paragraph with bold text.\nSecond block")
  }

  test("script body with embedded angle brackets is dropped wholesale") {
    assert(extract("<p>a</p><script>if (x<5 && y>2) alert('</div>')</script><p>b</p>") == "a\nb")
  }

  test("entities decode once, &amp; last — no double decode") {
    assert(extract("<p>1 &lt; 2 &amp;&amp; 3 &gt; 2</p>") == "1 < 2 && 3 > 2")
    // &amp;lt; is the LITERAL string "&lt;" — must not become "<"
    assert(extract("<p>write &amp;lt; for less-than</p>") == "write &lt; for less-than")
    assert(extract("<p>&quot;q&quot; &#39;s&#39;&nbsp;end</p>") == "\"q\" 's' end")
  }

  test("inline tags strip without inserting line breaks") {
    assert(extract("<p>a <em>b</em> <span class=\"x\">c</span> d</p>") == "a b c d")
  }

  test("self-closing and attribute-heavy block tags break lines") {
    assert(extract("one<br/>two<hr />three") == "one\ntwo\nthree")
    assert(extract("""<div id="a" data-x="1>0">inside</div>after""") != "")
  }

  test("whitespace: horizontal runs collapse, blank lines vanish, edges trim") {
    assert(extract("<p>  a\t b </p>\n\n\n<p> c  </p>") == "a b\nc")
    assert(extract("<div></div><div></div>") == "")
  }

  test("null and plain text are safe") {
    val r = Seq[Option[String]](None, Some("no tags at all"))
      .toDF("h").select(HtmlExtract.extractText(col("h")).as("t"))
      .collect().map(_.getString(0))
    assert(r.toSeq == Seq("", "no tags at all"))
  }

  test("extraction stats count tags, links, scripts") {
    val html = "<html><body><a href=\"/\">x</a><a href=\"/b\">y</a>" +
      "<script>var a=1;</script><p>t</p></body></html>"
    val r = Seq(html).toDF("h")
      .select(HtmlExtract.extractionStats(col("h")).as("s"))
      .select("s.raw_chars", "s.text_chars", "s.n_tags", "s.n_links", "s.n_scripts")
      .head()
    assert(r.getLong(0) == html.length.toLong)
    assert(r.getLong(1) == "xy\nt".length.toLong) // adjacent inline <a>s: no separator
    assert(r.getLong(3) == 2L && r.getLong(4) == 1L)
  }

  test("composes with Boilerplate line cleaning downstream") {
    val html = "<nav>Home | About | Contact</nav>" +
      "<p>the extracted article text is long enough and has the stop words to survive</p>"
    val df = Seq(html).toDF("h").select(HtmlExtract.extractText(col("h")).as("text"))
    val cleaned = Boilerplate.addCleanLines(df, col("text"))
      .select("bl.clean_text").head().getString(0)
    assert(cleaned == "the extracted article text is long enough and has the stop words to survive")
  }

  test("extractLinks: hrefs + tag-stripped anchors; fragments and null html excluded") {
    val html = """<a href="https://a.com/x">Go <b>here</b></a>
      |<a class=big href='/rel'>Rel</a>
      |<a href="#frag">skip</a>
      |<a href="//cdn.com/z">proto</a>""".stripMargin
    val got = Seq(html).toDF("h")
      .select(explode(HtmlExtract.extractLinks(col("h"))).as("l"))
      .select("l.href", "l.anchor").as[(String, String)].collect().toSeq
    assert(got === Seq(("https://a.com/x", "Go here"), ("/rel", "Rel"),
      ("//cdn.com/z", "proto")))
    val none = Seq(null.asInstanceOf[String]).toDF("h")
      .select(size(HtmlExtract.extractLinks(col("h"))).as("n")).head().getInt(0)
    assert(none === 0)
  }

  test("resolveLink: absolute kept, //- and /-relative completed, junk null") {
    val df = Seq(
      ("https://base.org/p/q", "https://x.com/a"),
      ("https://base.org/p/q", "//cdn.io/lib.js"),
      ("https://base.org/p/q", "/about"),
      ("https://base.org/p/q", "relative/path"),
      ("https://base.org/p/q", "mailto:a@b.c"),
      ("https://base.org/p/q", "javascript:void(0)")).toDF("base", "href")
    val got = df.select(HtmlExtract.resolveLink(col("base"), col("href")).as("r"))
      .as[Option[String]].collect().toSeq
    assert(got === Seq(Some("https://x.com/a"), Some("https://cdn.io/lib.js"),
      Some("https://base.org/about"), None, None, None))
  }

  test("linkEdges: canonicalized, self-loops dropped, deduped — PageRank-ready") {
    val pages = Seq(
      ("https://A.com/page?utm_source=x",
        """<a href="https://b.com/1">b</a><a href="https://b.com/1#frag2">dup?</a>
          |<a href="/page">self</a><a href="https://b.com/1?utm_source=y">trackdup</a>""".stripMargin),
      ("https://b.com/1", """<a href="https://a.com/page">back</a>"""))
      .toDF("url", "html")
    val got = HtmlExtract.linkEdges(pages, col("url"), col("html"))
      .as[(String, String)].collect().toSet
    // utm params stripped both sides; /page resolves to the SAME
    // canonical page → self-loop dropped; b.com/1 deduped
    assert(got === Set(("https://a.com/page", "https://b.com/1"),
      ("https://b.com/1", "https://a.com/page")))
  }
}
