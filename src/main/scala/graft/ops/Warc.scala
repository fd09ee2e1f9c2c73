package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) record parsing — the container web crawls actually
  * arrive in (CommonCrawl ships `.warc.gz`). The shape mirrors
  * [[Multimodal]]'s codec layer: a byte-cursor kernel with the corrupt-
  * size discipline (Long cursors, refuse-don't-guess, truncation never
  * throws), a deterministic ingest-side encoder twin for fixtures, and a
  * mapPartitions batch op — payload columns stay opaque binary until this
  * step, then flow into [[Html]]/[[Web]]/[[TextAnalysis]].
  *
  * Format notes (all public spec): a record is `WARC/1.x\r\n`, header
  * lines `Name: Value\r\n`, a blank line, `Content-Length` octets of
  * block, then `\r\n\r\n`. Response records carry an HTTP response in the
  * block (status line, headers, blank line, body). Per-record gzip
  * members are the standard on-disk form — a leading gzip magic routes
  * through a multi-member `GZIPInputStream` (bounded by `MaxDecompressed`
  * — a gzip bomb refuses instead of OOMing the executor).
  *
  * Parsing is tolerant the way a 100 TB crawl job needs: a malformed or
  * truncated record ends THAT payload's parse (records before it are
  * kept); header names are case-insensitive; missing headers surface as
  * nulls/empty, never exceptions.
  */
object Warc {

  /** Decompression ceiling per payload (gzip-bomb guard). */
  val MaxDecompressed: Long = 1L << 30

  final case class WarcRecord(
      record_idx: Int,
      warc_type: String,
      target_uri: String,
      warc_date: String,
      http_status: Int, // -1 when the block is not an HTTP response
      content_type: String, // the HTTP Content-Type for responses, else ''
      body: Array[Byte]) // HTTP body for responses, raw block otherwise

  /** Parse every record of one WARC payload (gzipped or plain). */
  def parseWarc(bytes: Array[Byte]): Seq[WarcRecord] = {
    if (bytes == null || bytes.length < 4) return Nil
    val data =
      if ((bytes(0) & 0xFF) == 0x1F && (bytes(1) & 0xFF) == 0x8B) gunzip(bytes)
      else bytes
    if (data == null) return Nil
    val out = Seq.newBuilder[WarcRecord]
    var cursor = 0L
    var idx = 0
    var ok = true
    while (ok && cursor < data.length) {
      parseRecord(data, cursor, idx) match {
        case Some((rec, next)) =>
          out += rec
          idx += 1
          cursor = next
        case None => ok = false
      }
    }
    out.result()
  }

  /** Multi-member gzip inflate with the bomb guard; null on any error. */
  private def gunzip(bytes: Array[Byte]): Array[Byte] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var total = 0L
      var n = in.read(buf)
      while (n >= 0) {
        total += n
        if (total > MaxDecompressed) return null
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      out.toByteArray
    } catch { case _: java.io.IOException => null }

  /** One record at `start`; Some((record, nextCursor)) or None when the
    * bytes at `start` are not a complete well-formed record.
    */
  private def parseRecord(
      data: Array[Byte], start: Long, idx: Int): Option[(WarcRecord, Long)] = {
    val headEnd = indexOfBlankLine(data, start)
    if (headEnd < 0) return None
    val head = new String(data, start.toInt, (headEnd - start).toInt,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val lines = head.split("\r\n")
    if (lines.isEmpty || !lines(0).startsWith("WARC/")) return None
    val headers = parseHeaders(lines.drop(1))
    val len =
      try headers.getOrElse("content-length", return None).trim.toLong
      catch { case _: NumberFormatException => return None }
    val blockStart = headEnd + 4 // past \r\n\r\n
    // subtraction form: `blockStart + len` overflows Long for a crafted
    // Content-Length near Long.MaxValue and would pass the naive bound
    // check, then crash the copy — a corrupt record must END the parse,
    // never throw (the media-codec corrupt-size discipline)
    if (len < 0 || len > data.length - blockStart) return None
    val block = java.util.Arrays.copyOfRange(
      data, blockStart.toInt, (blockStart + len).toInt)
    val (status, ctype, body) =
      if (looksLikeHttpResponse(block)) parseHttpResponse(block)
      else (-1, "", block)
    val rec = WarcRecord(
      idx,
      headers.getOrElse("warc-type", ""),
      headers.getOrElse("warc-target-uri", ""),
      headers.getOrElse("warc-date", ""),
      status, ctype, body)
    // the separator after the block (\r\n\r\n) is tolerated absent at EOF
    var next = blockStart + len
    if (next + 4 <= data.length && data(next.toInt) == '\r') next += 4
    Some((rec, next))
  }

  private def parseHeaders(lines: Array[String]): Map[String, String] =
    lines.iterator.flatMap { l =>
      val c = l.indexOf(':')
      if (c <= 0) None
      else Some(l.substring(0, c).trim.toLowerCase -> l.substring(c + 1).trim)
    }.toMap

  private def looksLikeHttpResponse(block: Array[Byte]): Boolean =
    block.length >= 5 && block(0) == 'H' && block(1) == 'T' &&
      block(2) == 'T' && block(3) == 'P' && block(4) == '/'

  private def parseHttpResponse(block: Array[Byte]): (Int, String, Array[Byte]) = {
    val headEnd = indexOfBlankLine(block, 0L)
    if (headEnd < 0) return (-1, "", block)
    val head = new String(block, 0, headEnd.toInt,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val lines = head.split("\r\n")
    val status =
      try {
        val parts = lines(0).split(" ")
        if (parts.length >= 2) parts(1).toInt else -1
      } catch { case _: NumberFormatException => -1 }
    val ctype = parseHeaders(lines.drop(1)).getOrElse("content-type", "")
    val body = java.util.Arrays.copyOfRange(
      block, (headEnd + 4).toInt, block.length)
    (status, ctype, body)
  }

  /** First `\r\n\r\n` at/after `from`, or -1. */
  private def indexOfBlankLine(data: Array[Byte], from: Long): Long = {
    var i = from
    while (i + 3 < data.length) {
      if (data(i.toInt) == '\r' && data(i.toInt + 1) == '\n' &&
        data(i.toInt + 2) == '\r' && data(i.toInt + 3) == '\n') return i
      i += 1
    }
    -1L
  }

  private def charsetOf(name: String): Option[java.nio.charset.Charset] =
    try Some(java.nio.charset.Charset.forName(name))
    catch { case _: Exception => None }

  /** WHATWG-style encoding sniff for a crawl response body, in spec
    * precedence order: (1) a byte-order mark (UTF-8/UTF-16 — the BOM
    * overrides even the transport header, per the Encoding standard),
    * (2) the Content-Type `charset=` parameter, (3) a meta prescan of the
    * first 1024 bytes for `<meta charset=…>` /
    * `<meta http-equiv="Content-Type" content="…charset=…">` (read as
    * latin-1, which is ASCII-transparent), (4) UTF-8 — the practical
    * crawl default (the browser spec says windows-1252, but that is a
    * legacy-rendering rule; modern corpora are overwhelmingly UTF-8 and
    * mojibake from a wrong UTF-8 guess is detectable downstream, unlike
    * silently "valid" 1252). Returns the charset plus its provenance tag
    * (`"bom"|"header"|"meta"|"default"`) so a 100 TB run can COUNT how
    * its corpus declared itself. Unrecognized charset names fall through
    * to the next step rather than erroring.
    */
  def sniffCharset(
      body: Array[Byte],
      contentType: String): (java.nio.charset.Charset, String) = {
    import java.nio.charset.StandardCharsets._
    if (body.length >= 3 && body(0) == 0xEF.toByte && body(1) == 0xBB.toByte &&
      body(2) == 0xBF.toByte) return (UTF_8, "bom")
    if (body.length >= 2 && body(0) == 0xFE.toByte && body(1) == 0xFF.toByte)
      return (UTF_16, "bom") // java's UTF-16 consumes the BOM itself
    if (body.length >= 2 && body(0) == 0xFF.toByte && body(1) == 0xFE.toByte)
      return (UTF_16, "bom")
    val fromHeader =
      if (contentType == null) None
      else "(?i)charset=\"?([A-Za-z0-9_.:-]+)".r.findFirstMatchIn(contentType)
        .flatMap(m => charsetOf(m.group(1)))
    fromHeader match {
      case Some(cs) => (cs, "header")
      case None =>
        // WHATWG prescan: comments are skipped (an unterminated comment
        // swallows the rest of the window), so a commented-out
        // `<meta charset>` must not win over a live one
        val prefix = new String(body, 0, math.min(1024, body.length),
          java.nio.charset.StandardCharsets.ISO_8859_1)
          .replaceAll("(?s)<!--.*?(-->|$)", " ")
        val fromMeta =
          "(?i)<meta\\s[^>]*charset\\s*=\\s*[\"']?([A-Za-z0-9_.:-]+)".r
            .findFirstMatchIn(prefix).flatMap(m => charsetOf(m.group(1)))
        fromMeta match {
          case Some(cs) => (cs, "meta")
          case None => (UTF_8, "default")
        }
    }
  }

  /** Decode with an already-resolved charset (replacement for malformed
    * sequences; leading BOM char stripped) — the hot-path form for
    * callers that already sniffed, so the 1024-byte prescan never runs
    * twice per record.
    */
  def decodeBodyWith(body: Array[Byte], cs: java.nio.charset.Charset): String = {
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    try {
      val s = dec.decode(java.nio.ByteBuffer.wrap(body)).toString
      if (s.nonEmpty && s.charAt(0) == '\uFEFF') s.substring(1) else s
    } catch { case _: Exception => "" }
  }

  /** Decode a response body to text via [[sniffCharset]] (BOM → header →
    * meta prescan → UTF-8), with replacement for malformed sequences —
    * crawl bodies are never trusted to be well-encoded. A leading BOM
    * character is stripped from the decoded text.
    */
  def decodeBody(body: Array[Byte], contentType: String): String =
    decodeBodyWith(body, sniffCharset(body, contentType)._1)

  final case class WarcRow(
      id: Long,
      record_idx: Int,
      warc_type: String,
      target_uri: String,
      warc_date: String,
      http_status: Int,
      content_type: String,
      n_body_bytes: Int,
      body_text: String, // charset-decoded for textual responses, else ''
      charset: String, // resolved charset name for textual responses, else ''
      charset_source: String) // "bom"|"header"|"meta"|"default", else ''

  /** Batch record extraction over WARC payload rows — the mapPartitions
    * shape every real shard reader plugs into (`spark.read.format(
    * "binaryFile")` → one row per `.warc.gz` → this). Text bodies
    * (`content_type` starting `text/` or containing `html`) arrive
    * charset-decoded via the full [[sniffCharset]] chain (BOM → header →
    * meta prescan → UTF-8), ready for [[Html.htmlMainText]], with the
    * resolved `charset` + `charset_source` columns for corpus encoding
    * accounting; other bodies surface length-only here — use
    * [[parseWarc]] directly when raw bytes are needed.
    */
  def records(
      spark: SparkSession, media: DataFrame,
      idCol: String = "id", bytesCol: String = "media"): Dataset[WarcRow] = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          parseWarc(bytes).iterator.map { r =>
            val textual = r.content_type.toLowerCase.startsWith("text/") ||
              r.content_type.toLowerCase.contains("html")
            val (cs, src) =
              if (textual) sniffCharset(r.body, r.content_type) else (null, "")
            WarcRow(id, r.record_idx, r.warc_type, r.target_uri, r.warc_date,
              r.http_status, r.content_type, r.body.length,
              if (textual) decodeBodyWith(r.body, cs) else "",
              if (textual) cs.name().toLowerCase else "", src)
          }
        }
      }
  }

  // ── ingest-side encoder twin (fixtures, tests, oracle construction) ──

  /** Encode one record; `block` is written verbatim with a correct
    * Content-Length.
    */
  def encodeRecord(
      warcType: String, targetUri: String, date: String,
      block: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder()
    sb.append("WARC/1.0\r\n")
    sb.append(s"WARC-Type: $warcType\r\n")
    if (targetUri.nonEmpty) sb.append(s"WARC-Target-URI: $targetUri\r\n")
    if (date.nonEmpty) sb.append(s"WARC-Date: $date\r\n")
    sb.append(s"Content-Length: ${block.length}\r\n\r\n")
    val head = sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = new Array[Byte](head.length + block.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(block, 0, out, head.length, block.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** An HTTP/1.1 response block. */
  def encodeHttpResponse(
      status: Int, contentType: String, body: Array[Byte]): Array[Byte] = {
    val head = (s"HTTP/1.1 $status OK\r\nContent-Type: $contentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    head ++ body
  }

  def concat(records: Seq[Array[Byte]]): Array[Byte] =
    records.foldLeft(Array.empty[Byte])(_ ++ _)

  /** Gzip a payload as ONE member (multi-record files still inflate —
    * the reader's GZIPInputStream handles both layouts).
    */
  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(bytes); g.close()
    bos.toByteArray
  }
}
