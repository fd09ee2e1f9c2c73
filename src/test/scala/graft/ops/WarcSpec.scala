package graft.ops

import graft.SparkSpec

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def htmlResponse(html: String, ctype: String = "text/html; charset=utf-8") =
    Warc.encodeHttpResponse(200, ctype, html.getBytes("UTF-8"))

  private def fixture: Array[Byte] = Warc.concat(Seq(
    Warc.encodeRecord("warcinfo", "", "2026-08-15T00:00:00Z",
      "software: graft-test\r\n".getBytes("UTF-8")),
    Warc.encodeRecord("response", "https://a.com/x", "2026-08-15T00:00:01Z",
      htmlResponse("<html><title>A</title><p>hello world</p></html>")),
    Warc.encodeRecord("response", "https://b.com/y", "2026-08-15T00:00:02Z",
      Warc.encodeHttpResponse(404, "application/octet-stream",
        Array[Byte](1, 2, 3, 4, 5)))))

  test("round-trip: encoder twin parses back, plain and gzipped, field-exact") {
    Seq(fixture, Warc.gzip(fixture)).foreach { payload =>
      val recs = Warc.parseWarc(payload)
      assert(recs.length == 3)
      assert(recs(0).warc_type == "warcinfo" && recs(0).http_status == -1)
      assert(new String(recs(0).body, "UTF-8") == "software: graft-test\r\n")
      assert(recs(1).warc_type == "response")
      assert(recs(1).target_uri == "https://a.com/x")
      assert(recs(1).http_status == 200)
      assert(recs(1).content_type == "text/html; charset=utf-8")
      assert(new String(recs(1).body, "UTF-8").contains("hello world"))
      assert(recs(2).http_status == 404)
      assert(recs(2).body.toSeq == Seq[Byte](1, 2, 3, 4, 5))
    }
  }

  test("multi-member gzip (the .warc.gz standard layout) inflates fully") {
    val members = Warc.concat(Seq(
      Warc.gzip(Warc.encodeRecord("response", "https://a.com/1", "",
        htmlResponse("<p>one</p>"))),
      Warc.gzip(Warc.encodeRecord("response", "https://a.com/2", "",
        htmlResponse("<p>two</p>")))))
    val recs = Warc.parseWarc(members)
    assert(recs.map(_.target_uri) == Seq("https://a.com/1", "https://a.com/2"))
  }

  test("charset handling: declared charset decodes, bogus charset falls back") {
    val latin = "café".getBytes("ISO-8859-1")
    assert(Warc.decodeBody(latin, "text/html; charset=iso-8859-1") == "café")
    // the same bytes read as UTF-8 are malformed -> replacement char, no throw
    assert(Warc.decodeBody(latin, "text/html").contains("caf"))
    assert(Warc.decodeBody(latin, "text/html; charset=not-a-charset").contains("caf"))
    assert(Warc.decodeBody("x".getBytes, "text/plain; charset=\"utf-8\"") == "x")
  }

  test("a crafted huge Content-Length refuses the record, never overflows/throws") {
    val good = Warc.encodeRecord("response", "https://a/x", "",
      Warc.encodeHttpResponse(200, "text/plain", "ok".getBytes))
    // Long.MaxValue-class lengths would wrap `blockStart + len` negative
    // and pass a naive bound check into a crashing copy
    Seq(Long.MaxValue, Long.MaxValue - 2, Long.MaxValue / 2).foreach { n =>
      val evil = ("WARC/1.0\r\nWARC-Type: response\r\n" +
        s"Content-Length: $n\r\n\r\n").getBytes("ISO-8859-1")
      assert(Warc.parseWarc(evil).isEmpty)
      // prior records still parse when the poisoned one follows them
      val mixed = Warc.concat(Seq(good, evil))
      assert(Warc.parseWarc(mixed).map(_.warc_type) == Seq("response"))
    }
  }

  test("sniffCharset precedence: bom > header > meta > default; bad names fall through") {
    import java.nio.charset.StandardCharsets._
    def named(r: (java.nio.charset.Charset, String)) = (r._1.name.toLowerCase, r._2)
    // BOM beats a lying header; the BOM char is stripped from the decode
    val bommed = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ "día".getBytes(UTF_8)
    assert(named(Warc.sniffCharset(bommed, "text/html; charset=iso-8859-1")) ==
      ("utf-8", "bom"))
    assert(Warc.decodeBody(bommed, "text/html; charset=iso-8859-1") == "día")
    // UTF-16 BOMs resolve to java's BOM-consuming UTF-16 charset
    val be = Array(0xFE.toByte, 0xFF.toByte, 0.toByte, 'h'.toByte)
    assert(named(Warc.sniffCharset(be, "text/html")) == ("utf-16", "bom"))
    assert(Warc.decodeBody(be, "text/html") == "h")
    val le = Array(0xFF.toByte, 0xFE.toByte, 'h'.toByte, 0.toByte)
    assert(Warc.decodeBody(le, "text/html") == "h")
    // header wins over meta when both present
    val both = ("<html><head><meta charset=\"utf-8\"></head><body>café</body></html>")
      .getBytes(ISO_8859_1)
    assert(named(Warc.sniffCharset(both, "text/html; charset=iso-8859-1")) ==
      ("iso-8859-1", "header"))
    // meta fires only when the header has no (valid) charset — both the
    // html5 form and the legacy http-equiv content= form
    assert(named(Warc.sniffCharset(both, "text/html")) == ("utf-8", "meta"))
    assert(named(Warc.sniffCharset(both, "text/html; charset=bogus!")) == ("utf-8", "meta"))
    val legacy = ("<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=ISO-8859-1\"></head></html>").getBytes(ISO_8859_1)
    assert(named(Warc.sniffCharset(legacy, "text/html")) == ("iso-8859-1", "meta"))
    // a commented-out meta never wins (WHATWG prescan skips comments) —
    // including the unterminated-comment form, which swallows the window
    val commented = ("<!-- <meta charset=\"iso-8859-1\"> -->" +
      "<meta charset=\"utf-8\"><body>x</body>").getBytes(ISO_8859_1)
    assert(named(Warc.sniffCharset(commented, "text/html")) == ("utf-8", "meta"))
    val dangling = "<!-- <meta charset=\"iso-8859-1\"> <body>x</body>"
      .getBytes(ISO_8859_1)
    assert(named(Warc.sniffCharset(dangling, "text/html")) == ("utf-8", "default"))
    // a meta past the 1024-byte prescan window is ignored → default
    val far = ("<html>" + " " * 1100 +
      "<meta charset=\"iso-8859-1\"></html>").getBytes(ISO_8859_1)
    assert(named(Warc.sniffCharset(far, "text/html")) == ("utf-8", "default"))
    // nothing declared anywhere → utf-8 default
    assert(named(Warc.sniffCharset("plain".getBytes(UTF_8), "text/html")) ==
      ("utf-8", "default"))
    assert(named(Warc.sniffCharset("plain".getBytes(UTF_8), null)) ==
      ("utf-8", "default"))
  }

  test("truncation and corruption never throw; prior records survive") {
    val full = fixture
    // every truncation point parses to a (possibly shorter) prefix
    Seq(3, 20, 100, full.length / 2, full.length - 3).foreach { cut =>
      val recs = Warc.parseWarc(java.util.Arrays.copyOf(full, cut))
      assert(recs.length <= 3)
      recs.foreach(r => assert(r.record_idx >= 0))
    }
    // a content-length pointing past EOF stops cleanly at that record
    val lied = new String(full, "ISO-8859-1")
      .replaceFirst("Content-Length: 22", "Content-Length: 99999")
      .getBytes("ISO-8859-1")
    assert(Warc.parseWarc(lied).isEmpty)
    // bit flips: parse result varies, exceptions never
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val mut = full.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      Warc.parseWarc(mut): Unit
    }
    assert(Warc.parseWarc(null) == Nil)
    assert(Warc.parseWarc(Array[Byte](1, 2)) == Nil)
    // corrupt gzip refuses to Nil rather than throwing
    val badGz = Warc.gzip(full).clone()
    badGz(badGz.length / 2) = (badGz(badGz.length / 2) ^ 0xFF).toByte
    Warc.parseWarc(badGz): Unit
  }

  test("records() op: text bodies decode, binary bodies surface length-only") {
    val media = Seq((7L, fixture)).toDF("id", "media")
    val rows = Warc.records(spark, media).collect().sortBy(_.record_idx)
    assert(rows.length == 3)
    assert(rows(1).body_text.contains("hello world"))
    assert(rows(2).body_text == "" && rows(2).n_body_bytes == 5)
    // null payloads skip (engine-wide rule)
    val withNull = Seq((1L, null: Array[Byte])).toDF("id", "media")
    assert(Warc.records(spark, withNull).count() == 0)
  }

  test("parsed records chain into the HTML extractor") {
    import org.apache.spark.sql.functions._
    val media = Seq((1L, Warc.gzip(fixture))).toDF("id", "media")
    val titles = Warc.records(spark, media)
      .where(col("http_status") === 200)
      .select(Html.htmlTitle(col("body_text")))
      .as[String].collect().toSeq
    assert(titles == Seq("A"))
  }
}
