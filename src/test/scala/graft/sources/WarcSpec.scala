package graft.sources

import graft.SparkSpec
import java.io.ByteArrayOutputStream

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def record(tpe: String, uri: String, contentType: String,
                     payload: Array[Byte]): Array[Byte] = {
    val head = (s"WARC/1.0\r\n" +
      s"WARC-Type: $tpe\r\n" +
      (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
      s"Content-Type: $contentType\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes("US-ASCII")
    val bos = new ByteArrayOutputStream()
    bos.write(head); bos.write(payload); bos.write("\r\n\r\n".getBytes("US-ASCII"))
    bos.toByteArray
  }

  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    parts.foreach(bos.write)
    bos.toByteArray
  }

  private def httpResponse(html: String): Array[Byte] =
    ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n" + html)
      .getBytes("UTF-8")

  test("multi-record archive parses with byte-exact payloads") {
    // binary payload CONTAINING \r\n\r\n — Content-Length-driven
    // parsing must not split on it (the delimiter-scanning trap)
    val trap = "before\r\n\r\nafter".getBytes("US-ASCII") ++ Array[Byte](0, 1, 2)
    val html = httpResponse("<html><body><p>hello warc</p></body></html>")
    val warc = cat(
      record("warcinfo", "", "application/warc-fields", "software: test\r\n".getBytes("US-ASCII")),
      record("response", "https://a.example/x", "application/http;msgtype=response", html),
      record("resource", "https://a.example/bin", "application/octet-stream", trap),
      record("response", "https://b.example/y", "application/http;msgtype=response",
        httpResponse("<p>two</p>")))
    val recs = Warc.parseRecords(7L, warc)
    assert(recs.length == 4 && recs.forall(!_.truncated))
    assert(recs.map(_.warc_type) == Seq("warcinfo", "response", "resource", "response"))
    assert(recs(1).target_uri == "https://a.example/x")
    assert(recs(2).payload.toSeq == trap.toSeq) // byte-exact through the trap
    assert(recs(2).content_length == trap.length.toLong)
  }

  test("truncated tail flags instead of throwing") {
    val good = record("response", "https://a/x", "application/http", httpResponse("<p>a</p>"))
    val bad = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999999\r\n\r\nshort"
      .getBytes("US-ASCII")
    val recs = Warc.parseRecords(1L, cat(good, bad))
    assert(recs.length == 2)
    assert(!recs(0).truncated && recs(1).truncated && recs(1).content_length == -1L)
  }

  test("httpPayload splits status, content-type, body; rejects non-HTTP") {
    val p = Warc.httpPayload(httpResponse("<b>x</b>"))
    assert(p.ok && p.status == 200 && p.content_type.startsWith("text/html"))
    assert(new String(p.body, "UTF-8") == "<b>x</b>")
    assert(!Warc.httpPayload("not http".getBytes("US-ASCII")).ok)
  }

  test("records() explodes blobs distributively and composes with HtmlExtract") {
    import org.apache.spark.sql.functions._
    val w1 = cat(
      record("response", "https://a/1", "application/http", httpResponse(
        "<html><head><title>t</title></head><body><h1>Doc One</h1><p>alpha beta</p></body></html>")),
      record("request", "https://a/1", "application/http", "GET /1\r\n".getBytes("US-ASCII")))
    val w2 = record("response", "https://b/2", "application/http", httpResponse(
      "<body><p>gamma &amp; delta</p><script>var x;</script></body>"))
    val df = Seq((1L, w1), (2L, w2)).toDF("file_id", "content")
    val recs = Warc.records(spark, df)
    assert(recs.count() == 3)
    val bodies = Warc.records(spark, df).filter(_.warc_type == "response")
      .map(r => (r.file_id, new String(Warc.httpPayload(r.payload).body, "UTF-8")))
      .toDF("file_id", "html")
    val clean = bodies.select(col("file_id"),
      graft.text.HtmlExtract.extractText(col("html")).as("text"))
      .orderBy("file_id").collect().map(_.getString(1))
    assert(clean(0) == "Doc One\nalpha beta")
    assert(clean(1) == "gamma & delta")
  }
}
