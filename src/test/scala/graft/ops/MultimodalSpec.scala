package graft.ops

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary pipeline: text payloads flow through the stub decoder") {
    val docs = Seq((1L, "hello"), (2L, ""), (3L, "a" * 100)).toDF("doc_id", "text")
    val media = Multimodal.fromText(docs, "doc_id", "text")
    assert(media.schema("media").dataType.typeName == "binary")
    val feats = Multimodal.extractFeatures(spark, media)
      .collect().map(f => f.id -> f).toMap
    assert(feats(1L).nBytes == 5)
    assert(feats(2L).nBytes == 0)
    assert(feats(3L).nBytes == 100)
    assert(feats(3L).thumbnailBytes == 50)
    // histogram is a unit-L1 16-bin vector for non-empty payloads
    assert(math.abs(feats(1L).histogram.sum - 1.0f) < 1e-5)
    assert(feats(2L).histogram.sum == 0.0f)
  }

  test("null media payloads are skipped, not crashed on") {
    import org.apache.spark.sql.functions._
    val media = Seq((1L, Some("ok")), (2L, None))
      .toDF("id", "text")
      .select(col("id"), encode(col("text"), "UTF-8").as("media"))
    assert(Multimodal.extractFeatures(spark, media).collect().map(_.id).toSeq == Seq(1L))
    assert(Multimodal.sampleFrameRows(spark, media, 4).collect().map(_.id).distinct.toSeq
      == Seq(1L))
  }

  test("stub decode is deterministic") {
    val b = "some bytes".getBytes("UTF-8")
    assert(Multimodal.MediaStub.decode(b).toSeq == Multimodal.MediaStub.decode(b).toSeq)
    assert(Multimodal.MediaStub.sampleFrames(b, 4).length == 3)
  }

  test("real image decode: exact pixel sums on a synthesized PNG; garbage falls back") {
    import org.apache.spark.sql.functions._
    val png = Multimodal.MediaCodec.encodePng(4, 3, (x, y) => {
      val r = 10 + x; val g = 20 + y; val b = 30 + x * y
      (r << 16) | (g << 8) | b
    })
    // expected sums over the 4x3 grid, computed independently
    val (er, eg, eb) = (for { y <- 0 until 3; x <- 0 until 4 } yield
      (10 + x, 20 + y, 30 + x * y))
      .foldLeft((0L, 0L, 0L)) { case ((a, b2, c), (r, g, b3)) => (a + r, b2 + g, c + b3) }
    val media = Seq((1L, png), (2L, "not an image".getBytes("UTF-8")))
      .toDF("id", "media")
    val rows = Multimodal.imageFeatures(spark, media).collect().map(f => f.id -> f).toMap
    val ok = rows(1L)
    assert(ok.decoded && ok.width == 4 && ok.height == 3 && ok.channels == 3)
    assert((ok.sum_r, ok.sum_g, ok.sum_b) == ((er, eg, eb)))
    assert(math.abs(ok.histogram.sum - 1.0f) < 1e-5)
    val bad = rows(2L)
    assert(!bad.decoded && bad.width == 0 && bad.sum_r == 0L)
    assert(bad.histogram.toSeq ==
      Multimodal.MediaStub.decode("not an image".getBytes("UTF-8")).toSeq)
  }

  test("real thumbnails: downscale to maxDim, never upscale, drop garbage") {
    import org.apache.spark.sql.functions._
    val big = Multimodal.MediaCodec.encodePng(100, 40, (x, y) => (x * y) & 0xFFFFFF)
    val small = Multimodal.MediaCodec.encodePng(5, 4, (_, _) => 0x808080)
    val media = Seq(
      (1L, big), (2L, small), (3L, "garbage".getBytes("UTF-8"))).toDF("id", "media")
    val t = Multimodal.thumbnails(spark, media, maxDim = 10)
      .collect().map(r => r.id -> r).toMap
    assert(t.keySet == Set(1L, 2L), "garbage must drop")
    assert(t(1L).width == 10 && t(1L).height == 4) // 100x40 scaled by 0.1
    assert(t(2L).width == 5 && t(2L).height == 4)  // already under maxDim: untouched
    assert(t(2L).thumb.toSeq == small.toSeq)
    // the thumbnail payload is itself a decodable PNG of the claimed dims
    val re = Multimodal.MediaCodec.decodeImage(t(1L).thumb).get
    assert(re.width == 10 && re.height == 4)
  }

  test("WAV fast path == the JDK SPI path, including non-canonical chunk layouts") {
    val samples = Array.tabulate[Short](200)(i => ((i * 251) % 3001 - 1500).toShort)
    val wav = Multimodal.MediaCodec.encodeWavPcm16(11025f, samples)
    val fast = Multimodal.MediaCodec.decodeAudio(wav).get
    val spi = Multimodal.MediaCodec.decodeAudioSpi(wav).get
    assert(fast == spi, s"fast=$fast spi=$spi")
    // splice an unknown LIST chunk between fmt and data: the parser must
    // skip it and still agree with the SPI reader
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ "INFOxy".getBytes("US-ASCII")
    val dataIdx = {
      var i = 12
      while (new String(wav, i, 4, "US-ASCII") != "data")
        i += 8 + ((wav(i + 4) & 0xFF) | ((wav(i + 5) & 0xFF) << 8) |
          ((wav(i + 6) & 0xFF) << 16) | ((wav(i + 7) & 0xFF) << 24))
      i
    }
    val spliced = wav.take(dataIdx) ++ listChunk ++ wav.drop(dataIdx)
    // fix the RIFF size field for the inserted bytes
    val riffLen = (spliced.length - 8)
    spliced(4) = (riffLen & 0xFF).toByte; spliced(5) = ((riffLen >> 8) & 0xFF).toByte
    spliced(6) = ((riffLen >> 16) & 0xFF).toByte; spliced(7) = ((riffLen >> 24) & 0xFF).toByte
    val fast2 = Multimodal.MediaCodec.decodeAudio(spliced).get
    val spi2 = Multimodal.MediaCodec.decodeAudioSpi(spliced).get
    assert(fast2 == spi2, s"fast=$fast2 spi=$spi2")
    assert(fast2.sumAbs == fast.sumAbs && fast2.frames == fast.frames)
  }

  test("imageAHash: known bit pattern on a half-dark image; deterministic; size-gated") {
    import org.apache.spark.sql.functions._
    // left half black (luma 0), right half white-ish (luma 200): global
    // mean 100, so exactly the right-half cells (bx >= 4) set their bits
    val png = Multimodal.MediaCodec.encodePng(16, 16, (x, _) =>
      if (x < 8) 0x000000 else 0xC8C8C8) // 200,200,200 → luma 200
    val media = Seq((1L, png), (2L, "junk".getBytes("UTF-8"))).toDF("id", "media")
    val rows = Multimodal.imageAHash(spark, media).collect()
    assert(rows.map(_.id).toSeq == Seq(1L), "undecodable payloads drop")
    val r = rows.head
    var expHi = 0L; var expLo = 0L
    for (by <- 0 until 8; bx <- 4 until 8) {
      val k = by * 8 + bx
      if (k < 32) expLo |= 1L << k else expHi |= 1L << (k - 32)
    }
    assert((r.hash_hi, r.hash_lo) == ((expHi, expLo)),
      f"got ${r.hash_hi}%x/${r.hash_lo}%x want $expHi%x/$expLo%x")
    // PNG re-encode invariance (lossless roundtrip → identical hash)
    val thumbless = Multimodal.MediaCodec.decodeImage(png).get
    assert(thumbless.width == 16)
    val re = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos); bos.toByteArray
    }
    assert(Multimodal.MediaCodec.ahash(re, 8) == Multimodal.MediaCodec.ahash(png, 8))
    // smaller than the grid: no signature
    val tiny = Multimodal.MediaCodec.encodePng(4, 4, (_, _) => 0xFFFFFF)
    assert(Multimodal.MediaCodec.ahash(tiny, 8).isEmpty)
    // grid bounds validated
    intercept[IllegalArgumentException](Multimodal.imageAHash(spark, media, grid = 9))
  }

  test("codecs never throw on corrupt, truncated, or bit-flipped payloads") {
    val wav = Multimodal.MediaCodec.encodeWavPcm16(
      8000f, Array.tabulate[Short](64)(i => (i * 331 % 2001 - 1000).toShort))
    val png = Multimodal.MediaCodec.encodePng(6, 5, (x, y) => (x * 40 + y) << 8)
    val rnd = new scala.util.Random(7)
    // random garbage of assorted lengths (including the 4-44 byte band
    // where header parsing is most fragile)
    (0 until 300).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(120))(rnd.nextInt().toByte)
      Multimodal.MediaCodec.decodeAudio(junk): Unit
      Multimodal.MediaCodec.decodeImage(junk): Unit
    }
    // every truncation point of real payloads
    (0 until wav.length).foreach(c => Multimodal.MediaCodec.decodeAudio(wav.take(c)): Unit)
    (0 until png.length by 3).foreach(c => Multimodal.MediaCodec.decodeImage(png.take(c)): Unit)
    // single-bit corruption sweeps — chunk-size bytes included (the Int-
    // overflow cursor-wrap class the Long offsets guard against)
    (0 until wav.length).foreach { i =>
      val c = wav.clone; c(i) = (c(i) ^ 0xFF).toByte
      Multimodal.MediaCodec.decodeAudio(c): Unit
    }
    (0 until png.length by 2).foreach { i =>
      val c = png.clone; c(i) = (c(i) ^ 0xFF).toByte
      Multimodal.MediaCodec.decodeImage(c): Unit
    }
    // and the uncorrupted payloads still decode afterwards (sanity)
    assert(Multimodal.MediaCodec.decodeAudio(wav).nonEmpty)
    assert(Multimodal.MediaCodec.decodeImage(png).nonEmpty)
  }

  test("AVI/DIB demux+decode: exact pixel sums, stride, row order, padding") {
    import org.apache.spark.sql.functions._
    // 5 wide → 15-byte rows pad to 16 (the padding seam under test)
    val w = 5; val h = 4
    def rgb(k: Int)(x: Int, y: Int): Int = {
      val r = (k * 50 + x * 7 + y * 31) % 256
      val g = (k * 30 + x * 11 + y) % 256
      val b = (k * 70 + x + y * 13) % 256
      (r << 16) | (g << 8) | b
    }
    val frames = (0 until 4).map(k => Multimodal.MediaCodec.encodeDib24Frame(w, h, rgb(k)))
    val avi = Multimodal.MediaCodec.encodeAvi(w, h, 10, "DIB", frames)
    val v = Multimodal.MediaCodec.parseAviVideo(avi).get
    assert(v.width == w && v.height == h && v.codec == "DIB" && v.fps == 10f)
    assert(v.frames.length == 4)
    def expSum(k: Int, ch: Int): Long =
      (for (x <- 0 until w; y <- 0 until h) yield ((rgb(k)(x, y) >> ch) & 0xFF).toLong).sum
    (0 until 4).foreach { k =>
      val info = Multimodal.MediaCodec.decodeVideoFrame(v, v.frames(k)).get
      assert(info.width == w && info.height == h)
      assert(info.sumR == expSum(k, 16) && info.sumG == expSum(k, 8) &&
        info.sumB == expSum(k, 0), s"frame $k")
    }
    // the op samples every 2nd frame with original indices, non-AVI drops
    val media = Seq((1L, avi), (2L, "plain text".getBytes("UTF-8"))).toDF("id", "media")
    val rows = Multimodal.videoFrameFeatures(spark, media, stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(rows.map(_.id).distinct.toSeq == Seq(1L))
    assert(rows.map(_.frame_idx).toSeq == Seq(0, 2))
    assert(rows.head.sum_r == expSum(0, 16) && rows(1).sum_r == expSum(2, 16))
    // sampleFrameRows rides the real demux for AVI payloads
    val fr = Multimodal.sampleFrameRows(spark, media.where(col("id") === 1), 2).collect()
    assert(fr.map(_.frame_idx).sorted.toSeq == Seq(0, 2))
    assert(fr.forall(_.n_bytes == 16 * h))
    // provenance tags: real demux rows carry the container codec, stub
    // rows carry the literal "stub" — a 100 TB run counts stub-sampled
    // rows with GROUP BY codec instead of inferring them
    assert(rows.forall(_.codec == "DIB"))
    assert(fr.forall(_.codec == "DIB"))
    val stubFr = Multimodal.sampleFrameRows(spark, media.where(col("id") === 2), 2).collect()
    assert(stubFr.nonEmpty && stubFr.forall(_.codec == "stub"))
  }

  test("AVI/MJPEG demux: frame payloads are the exact JPEGs; ImageIO decodes them") {
    val w = 16; val h = 12
    val jpegs = (0 until 3).map(k =>
      Multimodal.MediaCodec.encodeJpeg(w, h, (x, y) => ((k * 60 + x * 8) << 16) | (y * 10)))
    val avi = Multimodal.MediaCodec.encodeAvi(w, h, 25, "MJPG", jpegs)
    val v = Multimodal.MediaCodec.parseAviVideo(avi).get
    assert(v.codec == "MJPG" && v.fps == 25f && v.frames.length == 3)
    // the demux must hand back the UNTOUCHED JPEG bytes (byte equality),
    // so frame decode is exactly the already-oracle-gated image path
    (0 until 3).foreach(k => assert(v.frames(k).sameElements(jpegs(k)), s"frame $k"))
    (0 until 3).foreach { k =>
      val direct = Multimodal.MediaCodec.decodeImage(jpegs(k)).get
      val viaAvi = Multimodal.MediaCodec.decodeVideoFrame(v, v.frames(k)).get
      assert(viaAvi == direct.copy(grayHist = viaAvi.grayHist), s"frame $k")
      assert(viaAvi.width == w && viaAvi.height == h)
    }
  }

  test("lowercase and DMB1 MJPEG fourccs decode like MJPG") {
    val jpeg = Multimodal.MediaCodec.encodeJpeg(8, 8, (x, y) => (x * 30) << 16 | y * 30)
    Seq("mjpg", "Mjpg", "dmb1", "DMB1").foreach { fourcc =>
      val avi = Multimodal.MediaCodec.encodeAvi(8, 8, 10, fourcc, Seq(jpeg))
      val v = Multimodal.MediaCodec.parseAviVideo(avi).get
      assert(v.codec == fourcc.toUpperCase, s"$fourcc -> ${v.codec}")
      val info = Multimodal.MediaCodec.decodeVideoFrame(v, v.frames.head)
      assert(info.exists(i => i.width == 8 && i.height == 8),
        s"fourcc $fourcc parsed but did not decode")
    }
  }

  test("AVI parser never throws on corrupt, truncated, or bit-flipped payloads") {
    val frames = (0 until 2).map(k =>
      Multimodal.MediaCodec.encodeDib24Frame(5, 4, (x, y) => (k * 90 + x + y) << 8))
    val avi = Multimodal.MediaCodec.encodeAvi(5, 4, 10, "DIB", frames)
    val rnd = new scala.util.Random(13)
    (0 until 300).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(150))(rnd.nextInt().toByte)
      Multimodal.MediaCodec.parseAviVideo(junk): Unit
    }
    // every truncation point
    (0 until avi.length).foreach(c =>
      Multimodal.MediaCodec.parseAviVideo(avi.take(c)): Unit)
    // single-bit corruption sweep — includes every chunk-size field (the
    // Long-cursor discipline: a huge size must end the walk, not wrap)
    (0 until avi.length).foreach { i =>
      val c = avi.clone; c(i) = (c(i) ^ 0xFF).toByte
      Multimodal.MediaCodec.parseAviVideo(c).foreach { v =>
        v.frames.foreach(f => Multimodal.MediaCodec.decodeVideoFrame(v, f): Unit)
      }
    }
    // uncorrupted still parses afterwards
    assert(Multimodal.MediaCodec.parseAviVideo(avi).exists(_.frames.length == 2))
  }

  test("image codec fuzz: dimension bombs and truncated streams are refused, not thrown") {
    // r12 verdict item #7: the WAV parser got corrupt-chunk fuzzing; give
    // the ImageIO path the same treatment. A PNG HEADER declaring absurd
    // dimensions must be rejected by the decode paths' guards (ahash's
    // 2^26-pixel gate; decodeImage survives via ImageIO's own failure →
    // None), never OOM or throw.
    val png = Multimodal.MediaCodec.encodePng(10, 8, (x, y) => (x * 20) << 16 | y * 30)
    // forge width/height in the IHDR (bytes 16-23, big-endian) to 2^30
    val bomb = png.clone
    def putBE(o: Int, v: Int): Unit = {
      bomb(o) = (v >>> 24).toByte; bomb(o + 1) = (v >>> 16).toByte
      bomb(o + 2) = (v >>> 8).toByte; bomb(o + 3) = v.toByte
    }
    putBE(16, 1 << 30); putBE(20, 1 << 30)
    assert(Multimodal.MediaCodec.ahash(bomb, 8).isEmpty)
    Multimodal.MediaCodec.decodeImage(bomb): Unit // must not throw
    Multimodal.MediaCodec.resizeImage(bomb, 8): Unit
    // ahash truncation + bit-flip sweeps (mq5's kernel — decodeImage's
    // sweep lives in the corrupt-payload test above)
    (0 until png.length by 2).foreach(c => Multimodal.MediaCodec.ahash(png.take(c), 8): Unit)
    (0 until png.length by 2).foreach { i =>
      val c = png.clone; c(i) = (c(i) ^ 0xFF).toByte
      Multimodal.MediaCodec.ahash(c, 8): Unit
    }
    assert(Multimodal.MediaCodec.ahash(png, 8).nonEmpty)
  }

  test("TIFF decodes through the same ImageIO path (JDK 9+ ships the plugin)") {
    val w = 9; val h = 7
    def rgb(x: Int, y: Int): Int =
      ((x * 23 + y * 5) % 256) << 16 | ((x + y * 31) % 256) << 8 | ((x * 7) % 256)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "tiff", bos), "JDK TIFF writer absent?")
    val info = Multimodal.MediaCodec.decodeImage(bos.toByteArray).get
    def expSum(ch: Int): Long =
      (for (x <- 0 until w; y <- 0 until h) yield ((rgb(x, y) >> ch) & 0xFF).toLong).sum
    assert(info.width == w && info.height == h)
    // TIFF is lossless: channel sums are exact, like the PNG gate
    assert(info.sumR == expSum(16) && info.sumG == expSum(8) && info.sumB == expSum(0))
  }

  test("MP4/raw demux+decode: exact pixel sums, sample tables, stride") {
    import org.apache.spark.sql.functions._
    val w = 7; val h = 5 // odd width: raw rows are tightly packed, no padding seam
    def rgb(k: Int)(x: Int, y: Int): Int = {
      val r = (k * 41 + x * 9 + y * 23) % 256
      val g = (k * 29 + x * 5 + y * 3) % 256
      val b = (k * 61 + x * 2 + y * 17) % 256
      (r << 16) | (g << 8) | b
    }
    val frames = (0 until 4).map(k => Multimodal.MediaCodec.encodeRaw24Frame(w, h, rgb(k)))
    val mp4 = Multimodal.MediaCodec.encodeMp4Video(w, h, 12, "raw ", frames)
    val v = Multimodal.MediaCodec.parseMp4Video(mp4).get
    assert(v.container == "MP4" && v.codec == "RAW24")
    assert(v.width == w && v.height == h && v.fps == 12f && v.frames.length == 4)
    def expSum(k: Int, ch: Int): Long =
      (for (x <- 0 until w; y <- 0 until h) yield ((rgb(k)(x, y) >> ch) & 0xFF).toLong).sum
    (0 until 4).foreach { k =>
      val info = Multimodal.MediaCodec.decodeVideoFrame(v, v.frames(k)).get
      assert(info.width == w && info.height == h)
      assert(info.sumR == expSum(k, 16) && info.sumG == expSum(k, 8) &&
        info.sumB == expSum(k, 0), s"frame $k")
    }
    // the ops ride the container dispatch: MP4 payloads demux for real
    val media = Seq((1L, mp4)).toDF("id", "media")
    val rows = Multimodal.videoFrameFeatures(spark, media, stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(rows.map(_.frame_idx).toSeq == Seq(0, 2) && rows.forall(_.codec == "RAW24"))
    assert(rows.head.sum_r == expSum(0, 16) && rows(1).sum_b == expSum(2, 0))
    val fr = Multimodal.sampleFrameRows(spark, media, 2).collect()
    assert(fr.map(_.frame_idx).sorted.toSeq == Seq(0, 2))
    assert(fr.forall(f => f.codec == "RAW24" && f.n_bytes == 3 * w * h))
  }

  test("MP4/JPEG demux: per-sample stsz table hands back the exact JPEGs") {
    val w = 16; val h = 12
    // complexity grows with k (flat → noisy) so the JPEG lengths differ
    // and the encoder takes the per-sample stsz-table path
    val jpegs = (0 until 3).map(k =>
      Multimodal.MediaCodec.encodeJpeg(w, h, (x, y) =>
        (((x * 73 + y * 151 + k * ((x ^ y) * 97)) % 256) << 16) | (y * 12)))
    assert(jpegs.map(_.length).distinct.length > 1, "fixture must exercise the stsz table")
    val mp4 = Multimodal.MediaCodec.encodeMp4Video(w, h, 24, "jpeg", jpegs)
    val v = Multimodal.MediaCodec.parseMp4Video(mp4).get
    assert(v.codec == "JPEG" && v.fps == 24f && v.frames.length == 3)
    // the demux must hand back the UNTOUCHED JPEG bytes, so frame decode
    // is exactly the already-oracle-gated image path
    (0 until 3).foreach(k => assert(v.frames(k).sameElements(jpegs(k)), s"frame $k"))
    (0 until 3).foreach { k =>
      val direct = Multimodal.MediaCodec.decodeImage(jpegs(k)).get
      val viaMp4 = Multimodal.MediaCodec.decodeVideoFrame(v, v.frames(k)).get
      assert(viaMp4 == direct.copy(grayHist = viaMp4.grayHist), s"frame $k")
    }
  }

  test("avc1 containers parse to real metadata; frames do not decode") {
    import org.apache.spark.sql.functions._
    // compressed-bitstream samples the JVM cannot decode: garbage payloads
    // behind a REAL container — metadata must be exact, frames must drop
    val fake = (0 until 5).map(k => Array.tabulate[Byte](40 + k)(i => (i * 7 + k).toByte))
    val mp4 = Multimodal.MediaCodec.encodeMp4Video(640, 360, 30, "avc1", fake)
    val avi = Multimodal.MediaCodec.encodeAvi(8, 6, 10, "DIB",
      (0 until 2).map(k => Multimodal.MediaCodec.encodeDib24Frame(8, 6, (x, y) => x + y + k)))
    val media = Seq(
      (1L, mp4), (2L, avi), (3L, "not a video".getBytes("UTF-8")), (4L, null))
      .toDF("id", "media")
    val meta = Multimodal.videoMetadata(spark, media).collect().sortBy(_.id)
    assert(meta.map(_.id).toSeq == Seq(1L, 2L), "garbage and nulls drop")
    val m = meta.head
    assert(m.container == "MP4" && m.codec == "AVC1" && m.width == 640 &&
      m.height == 360 && m.fps == 30f && m.n_frames == 5 && !m.decodable)
    val a = meta(1)
    assert(a.container == "AVI" && a.codec == "DIB" && a.n_frames == 2 && a.decodable)
    // metadata-only parses copy no payloads (shared empty frames)
    val vNoFrames = Multimodal.MediaCodec.parseMp4Video(mp4, collectFrames = false).get
    assert(vNoFrames.frames.length == 5 && vNoFrames.frames.forall(_.length == 0))
    // the feature op drops undecodable frames but keeps the decodable AVI
    val feat = Multimodal.videoFrameFeatures(spark, media).collect()
    assert(feat.map(_.id).distinct.toSeq == Seq(2L))
  }

  test("MP4 parser never throws on corrupt, truncated, or bit-flipped payloads") {
    val frames = (0 until 2).map(k =>
      Multimodal.MediaCodec.encodeRaw24Frame(5, 4, (x, y) => (k * 90 + x + y) << 8))
    val mp4 = Multimodal.MediaCodec.encodeMp4Video(5, 4, 10, "raw ", frames)
    val rnd = new scala.util.Random(29)
    (0 until 300).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(150))(rnd.nextInt().toByte)
      Multimodal.MediaCodec.parseMp4Video(junk): Unit
    }
    // every truncation point (box sizes, table extents, sample ranges)
    (0 until mp4.length).foreach(c =>
      Multimodal.MediaCodec.parseMp4Video(mp4.take(c)): Unit)
    // single-bit corruption sweep — includes every box-size field, the
    // stsz/stsc/stco counts, and the chunk offset (a huge value must
    // refuse, not wrap or copy out of bounds)
    (0 until mp4.length).foreach { i =>
      val c = mp4.clone; c(i) = (c(i) ^ 0xFF).toByte
      Multimodal.MediaCodec.parseMp4Video(c).foreach { v =>
        v.frames.foreach(f => Multimodal.MediaCodec.decodeVideoFrame(v, f): Unit)
      }
    }
    // uncorrupted still parses afterwards
    assert(Multimodal.MediaCodec.parseMp4Video(mp4).exists(_.frames.length == 2))
  }

  test("real audio decode: exact sample aggregates on a synthesized WAV; text drops") {
    import org.apache.spark.sql.functions._
    val samples = Array.tabulate[Short](64)(i => ((i * 113) % 4001 - 2000).toShort)
    val wav = Multimodal.MediaCodec.encodeWavPcm16(8000f, samples)
    val expAbs = samples.map(s => math.abs(s.toInt).toLong).sum
    val expPeak = samples.map(s => math.abs(s.toInt)).max
    val media = Seq((1L, wav), (2L, "just text".getBytes("UTF-8"))).toDF("id", "media")
    val rows = Multimodal.audioFeatures(spark, media).collect()
    assert(rows.map(_.id).toSeq == Seq(1L), "non-audio must drop")
    val a = rows.head
    assert(a.sample_rate == 8000f && a.audio_channels == 1 && a.frames == 64L)
    assert(a.sum_abs == expAbs && a.peak == expPeak)
  }
}
