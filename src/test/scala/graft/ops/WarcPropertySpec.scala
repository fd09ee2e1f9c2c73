package graft.ops

import graft.SparkSpec

/** Property coverage for the WARC codec: random record mixes — binary
  * bodies, bodies containing CRLF-CRLF separators and "WARC/1.0" header
  * look-alikes, empty bodies, gzip/plain alternation — must round-trip
  * field-exact through encode → concat → parse. The parser is
  * Content-Length-driven, so embedded separators/markers inside a body
  * must never split or spoof a record; this is the property that
  * regexp/scan-based WARC readers get wrong.
  */
class WarcPropertySpec extends SparkSpec {

  test("random record mixes round-trip field-exact, plain and gzipped") {
    val rnd = new scala.util.Random(20260815L)
    (0 until 30).foreach { round =>
      val n = 1 + rnd.nextInt(5)
      val recs = (0 until n).map { i =>
        val kind = rnd.nextInt(4)
        val body: Array[Byte] = kind match {
          case 0 => Array.emptyByteArray
          case 1 => // adversarial text: separators + header look-alikes
            ("x\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n" +
              "Content-Length: 999999\r\n\r\ny" * (1 + rnd.nextInt(3)))
              .getBytes("ISO-8859-1")
          case 2 => Array.fill(rnd.nextInt(400))(rnd.nextInt().toByte)
          case _ =>
            Warc.encodeHttpResponse(
              200 + rnd.nextInt(300),
              "text/plain; charset=utf-8",
              s"body $round-$i \r\n\r\n tail".getBytes("UTF-8"))
        }
        (s"t$kind", s"https://h$round.com/$i", s"2026-08-15T00:0$i:00Z", body)
      }
      val raw = Warc.concat(recs.map { case (t, u, d, b) =>
        Warc.encodeRecord(t, u, d, b)
      })
      val payload = if (round % 2 == 1) Warc.gzip(raw) else raw
      val parsed = Warc.parseWarc(payload)
      assert(parsed.length == n, s"round $round: ${parsed.length} != $n")
      parsed.zip(recs).zipWithIndex.foreach {
        case ((p, (t, u, d, b)), i) =>
          assert(p.record_idx == i)
          assert(p.warc_type == t && p.target_uri == u && p.warc_date == d,
            s"round $round rec $i headers")
          // HTTP-response blocks parse into status + body; others verbatim
          if (t == "t3") {
            assert(p.http_status >= 200 && p.http_status < 500)
            assert(new String(p.body, "UTF-8").startsWith("body "))
          } else assert(p.body.sameElements(b), s"round $round rec $i body")
      }
    }
  }
}
