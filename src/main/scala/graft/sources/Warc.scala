package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** WARC (ISO 28500) record parsing — ingestion for ARCHIVED crawls
  * (Common-Crawl-shaped corpora arrive as WARC, not as live fetches):
  * each blob splits into records, HTTP `response` payloads split into
  * status/headers/body, and the body feeds the text pipeline
  * ([[graft.text.HtmlExtract]] → gates → dedup). The byte-exact
  * counterpart to [[HttpFetch]]'s live path.
  *
  * Format (re-expressed from the public spec): a record is a version
  * line `WARC/1.x`, CRLF-terminated `Name: value` header lines, an
  * empty line, then EXACTLY `Content-Length` payload bytes, then a
  * blank-line pair. Parsing is Content-Length-DRIVEN — payloads are
  * binary and may contain anything, including `\r\n\r\n`, so
  * delimiter scanning inside payloads is wrong by construction; the
  * spec plants that trap. Malformed tails flag a truncated record
  * (never throw — one corrupt archive member must not kill a task
  * processing thousands).
  *
  * Scale shape: one WARC blob → one `mapPartitions` row group (a
  * narrow map; no shuffle until the caller aggregates). 100 TB of
  * WARC = a file-per-row manifest read in parallel, each task
  * decoding only its own blobs — the same per-partition discipline as
  * [[HttpFetch]]/[[graft.multimodal.Multimodal]].
  */
object Warc {

  final case class WarcRecord(
      file_id: Long, rec_index: Int, warc_type: String, target_uri: String,
      content_type: String, content_length: Long, payload: Array[Byte],
      truncated: Boolean)

  /** HTTP response payload split: status code, content-type header,
    * body bytes. `ok = false` ⇒ not parseable as an HTTP response. */
  final case class HttpPayload(status: Int, content_type: String,
                               body: Array[Byte], ok: Boolean)

  private val Crlf = "\r\n".getBytes("US-ASCII")

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** Parse one WARC blob into records; byte-exact payload slices.
    * A malformed/truncated tail yields a final record with
    * `truncated = true` carrying whatever bytes remained. */
  def parseRecords(fileId: Long, bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = scala.collection.mutable.ArrayBuffer[WarcRecord]()
    var pos = 0
    var idx = 0
    while (pos < bytes.length) {
      // skip inter-record blank lines
      while (pos + 1 < bytes.length && bytes(pos) == '\r' && bytes(pos + 1) == '\n') pos += 2
      if (pos >= bytes.length) return out.toSeq
      val headerEnd = indexOfCrlfCrlf(bytes, pos)
      val headerText = if (headerEnd < 0) "" else
        new String(bytes, pos, headerEnd - pos, "US-ASCII")
      val lines = headerText.split("\r\n")
      val isWarc = lines.headOption.exists(_.startsWith("WARC/"))
      val headers = lines.drop(1).flatMap { l =>
        val c = l.indexOf(':')
        if (c < 0) None else Some(l.substring(0, c).trim.toLowerCase -> l.substring(c + 1).trim)
      }.toMap
      val lenOpt = headers.get("content-length").flatMap(v => scala.util.Try(v.toLong).toOption)
      (headerEnd, lenOpt) match {
        case (he, Some(len)) if isWarc && he >= 0 && he + 4 + len <= bytes.length =>
          val start = he + 4
          val payload = java.util.Arrays.copyOfRange(bytes, start, (start + len).toInt)
          out += WarcRecord(fileId, idx,
            headers.getOrElse("warc-type", ""), headers.getOrElse("warc-target-uri", ""),
            headers.getOrElse("content-type", ""), len, payload, truncated = false)
          idx += 1
          pos = start + len.toInt
        case _ =>
          // unparseable tail: surface it, do not throw
          out += WarcRecord(fileId, idx,
            if (isWarc) headers.getOrElse("warc-type", "") else "",
            headers.getOrElse("warc-target-uri", ""), headers.getOrElse("content-type", ""),
            -1L, java.util.Arrays.copyOfRange(bytes, pos, bytes.length), truncated = true)
          return out.toSeq
      }
    }
    out.toSeq
  }

  /** Explode (file_id, warc_bytes) rows into WARC records — a narrow
    * `mapPartitions` map, one task per file group. */
  def records(spark: SparkSession, warcs: DataFrame,
              id: String = "file_id", content: String = "content"): Dataset[WarcRecord] = {
    import spark.implicits._
    warcs.select(id, content).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (fid, bytes) => parseRecords(fid, bytes) })
  }

  /** Split an HTTP response payload (a `response` record's content)
    * into status, content-type, body. Content-Length-agnostic: the
    * body is everything after the first header/body separator, as the
    * WARC record length already bounds it. */
  def httpPayload(payload: Array[Byte]): HttpPayload = {
    val sep = indexOfCrlfCrlf(payload, 0)
    if (sep < 0) return HttpPayload(-1, "", Array.empty, ok = false)
    val head = new String(payload, 0, sep, "US-ASCII")
    val lines = head.split("\r\n")
    val status = lines.headOption.filter(_.startsWith("HTTP/")).map(_.split(" "))
      .filter(_.length >= 2).flatMap(p => scala.util.Try(p(1).toInt).toOption)
    status match {
      case Some(code) =>
        val ct = lines.drop(1).collectFirst {
          case l if l.toLowerCase.startsWith("content-type:") => l.substring(13).trim
        }.getOrElse("")
        HttpPayload(code, ct, java.util.Arrays.copyOfRange(payload, sep + 4, payload.length), ok = true)
      case None => HttpPayload(-1, "", Array.empty, ok = false)
    }
  }
}
