package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.ops.Multimodal

/** Media codec scale probe: the REAL image/audio decode paths
  * ([[Multimodal.imageFeatures]]/[[thumbnails]]/[[audioFeatures]]) at
  * crawl-shard volume — 200k 32×32 PNGs and 200k 256-sample WAVs,
  * synthesized once to parquet, then decoded through the production
  * mapPartitions path. Claims: decode throughput is executor-parallel
  * (rows/s scales with cores, no driver round-trips), a 10% garbage mix
  * flows through without failing or slowing the healthy rows, and the
  * memory-cached ImageIO path does no per-row temp-file IO (the JDK
  * default file cache would put one create+delete in /tmp per row — the
  * round-12 review finding this probe regression-guards).
  *
  * Run manually, record in BENCHNOTES:
  * `sbt "runMain graft.tools.MediaScaleProbe"` (env:
  * SPARK_GRAFT_MEDIA_ROWS to resize).
  */
object MediaScaleProbe {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_MEDIA_ROWS", "200000").toInt
    val dim = sys.env.getOrElse("SPARK_GRAFT_MEDIA_DIM", "32").toInt
    val fmt = sys.env.getOrElse("SPARK_GRAFT_MEDIA_FMT", "png") // png | jpeg
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("graft-mediascale").toString
    val out = Seq.newBuilder[String]

    // ── synthesize: 90% real images (dim×dim, id-derived pixels), 10% garbage
    val imgDir = s"$base/images"
    val genImgS = graft.BenchTiming.time {
      spark.range(rows.toLong).as[Long].repartition(32)
        .map { id =>
          val bytes =
            if (id % 10 == 9) s"not-an-image-$id".getBytes("UTF-8")
            else {
              val rgb = (x: Int, y: Int) =>
                ((id * 3 + x + y) % 256).toInt << 16 |
                  ((id * 5 + x) % 256).toInt << 8 | ((id + y) % 256).toInt
              if (fmt == "png") Multimodal.MediaCodec.encodePng(dim, dim, rgb)
              else {
                val img = new java.awt.image.BufferedImage(
                  dim, dim, java.awt.image.BufferedImage.TYPE_INT_RGB)
                for (y <- 0 until dim; x <- 0 until dim) img.setRGB(x, y, rgb(x, y))
                val bos = new java.io.ByteArrayOutputStream()
                javax.imageio.ImageIO.write(img, fmt, bos)
                bos.toByteArray
              }
            }
          (id, bytes)
        }
        .toDF("id", "media").write.mode("overwrite").parquet(imgDir)
    }
    val images = spark.read.parquet(imgDir)
    val mediaMB = images.agg(
      org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.octet_length(col("media"))))
      .first().getLong(0) / 1e6
    out += f"synthesized $rows%d ${dim}x$dim ${fmt.toUpperCase}s (10%% garbage, ${mediaMB}%.0f MB total): $genImgS%.1f s"

    def timeMin(f: => Long): (Long, Double) = {
      var n = 0L
      val t = (1 to 3).map(_ => graft.BenchTiming.time { n = f }).min
      (n, t)
    }
    val (nImg, tImg) = timeMin(Multimodal.imageFeatures(spark, images).count())
    val decodedCnt = Multimodal.imageFeatures(spark, images)
      .where(col("decoded")).count()
    out += f"imageFeatures: $nImg%d rows in $tImg%.2f s (${nImg / tImg}%.0f rows/s, ${mediaMB / tImg}%.0f MB/s; $decodedCnt%d decoded, ${nImg - decodedCnt}%d fallback)"
    require(decodedCnt == rows - rows / 10, s"decoded=$decodedCnt")

    val (nThumb, tThumb) = timeMin(
      Multimodal.thumbnails(spark, images, maxDim = 8).count())
    out += f"thumbnails(maxDim=8): $nThumb%d rows in $tThumb%.2f s (${nThumb / tThumb}%.0f rows/s; garbage dropped)"
    require(nThumb == rows - rows / 10, s"thumbs=$nThumb")

    // ── audio: 90% real 256-sample WAVs, 10% garbage
    val audDir = s"$base/audio"
    val genAudS = graft.BenchTiming.time {
      spark.range(rows.toLong).as[Long].repartition(32)
        .map { id =>
          val bytes =
            if (id % 10 == 9) s"not-audio-$id".getBytes("UTF-8")
            else Multimodal.MediaCodec.encodeWavPcm16(
              8000f,
              Array.tabulate[Short](256)(i => (((id * 31 + i * 7) % 4096) - 2048).toShort))
          (id, bytes)
        }
        .toDF("id", "media").write.mode("overwrite").parquet(audDir)
    }
    val audio = spark.read.parquet(audDir)
    out += f"synthesized $rows%d 256-sample WAVs (10%% garbage): $genAudS%.1f s"
    val (nAud, tAud) = timeMin(Multimodal.audioFeatures(spark, audio).count())
    out += f"audioFeatures: $nAud%d rows in $tAud%.2f s (${nAud / tAud}%.0f rows/s; garbage dropped)"
    require(nAud == rows - rows / 10, s"audio=$nAud")

    // ── video: AVI demux+decode at crawl volume (round-13 — the codec
    // went real; same 10% garbage mix). 8-frame 32×32 MJPEG per row ≈ a
    // short clip's keyframe set; per-frame cost should track the image
    // path's per-image cost (both are ImageIO JPEG decode + pixel pass),
    // leaving the RIFF demux layer as the measured residual.
    val vidRows = rows / 10 // video payloads are ~10× an image's bytes
    val vidDir = s"$base/video"
    val genVidS = graft.BenchTiming.time {
      spark.range(vidRows.toLong).as[Long].repartition(32)
        .map { id =>
          val bytes =
            if (id % 10 == 9) s"not-a-video-$id".getBytes("UTF-8")
            else {
              val frames = (0 until 8).map { k =>
                Multimodal.MediaCodec.encodeJpeg(dim, dim, (x, y) =>
                  ((id * 3 + k * 17 + x + y) % 256).toInt << 16 |
                    ((id * 5 + k + x) % 256).toInt << 8 | ((id + y) % 256).toInt)
              }
              Multimodal.MediaCodec.encodeAvi(dim, dim, 10, "MJPG", frames)
            }
          (id, bytes)
        }
        .toDF("id", "media").write.mode("overwrite").parquet(vidDir)
    }
    val video = spark.read.parquet(vidDir)
    out += f"synthesized $vidRows%d 8-frame ${dim}x$dim MJPEG AVIs (10%% garbage): $genVidS%.1f s"
    val (nVid, tVid) = timeMin(
      Multimodal.videoFrameFeatures(spark, video, stride = 2).count())
    val goodVids = (vidRows - vidRows / 10).toLong
    out += f"videoFrameFeatures(stride=2): $nVid%d frame rows in $tVid%.2f s (${nVid / tVid}%.0f frames/s = ${nVid / 4 / tVid}%.0f clips/s; garbage dropped)"
    require(nVid == goodVids * 4, s"video frames=$nVid expected ${goodVids * 4}")

    // ── video: ISO-BMFF demux at crawl volume (round-14 — MP4/MOV went
    // real). The same clips in the MP4 container (JPEG samples, per-sample
    // stsz tables) plus a 10% avc1 slice (real container, bitstream the
    // JVM can't decode — the metadata-only leg): videoFrameFeatures should
    // track the AVI arm (same ImageIO work, box-tree demux as the
    // residual), and videoMetadata should cost ~nothing per row
    // (collectFrames=false, zero payload copies).
    val mp4Dir = s"$base/video_mp4"
    val genMp4S = graft.BenchTiming.time {
      spark.range(vidRows.toLong).as[Long].repartition(32)
        .map { id =>
          val bytes =
            if (id % 10 == 9) s"not-a-video-$id".getBytes("UTF-8")
            else if (id % 10 == 4) {
              val fake = (0 until 8).map(k =>
                Array.tabulate[Byte](600)(i => (i * 7 + k + id).toByte))
              Multimodal.MediaCodec.encodeMp4Video(dim, dim, 30, "avc1", fake)
            } else {
              val frames = (0 until 8).map { k =>
                Multimodal.MediaCodec.encodeJpeg(dim, dim, (x, y) =>
                  ((id * 3 + k * 17 + x + y) % 256).toInt << 16 |
                    ((id * 5 + k + x) % 256).toInt << 8 | ((id + y) % 256).toInt)
              }
              Multimodal.MediaCodec.encodeMp4Video(dim, dim, 10, "jpeg", frames)
            }
          (id, bytes)
        }
        .toDF("id", "media").write.mode("overwrite").parquet(mp4Dir)
    }
    val mp4 = spark.read.parquet(mp4Dir)
    out += f"synthesized $vidRows%d 8-frame ${dim}x$dim MP4s (80%% MJPEG, 10%% avc1, 10%% garbage): $genMp4S%.1f s"
    val jpegVids = vidRows - 2 * (vidRows / 10) // ids %10==9 (garbage) and ==4 (avc1)
    val (nMp4, tMp4) = timeMin(
      Multimodal.videoFrameFeatures(spark, mp4, stride = 2).count())
    out += f"videoFrameFeatures(MP4, stride=2): $nMp4%d frame rows in $tMp4%.2f s (${nMp4 / tMp4}%.0f frames/s; avc1 + garbage dropped)"
    require(nMp4 == jpegVids * 4, s"mp4 frames=$nMp4 expected ${jpegVids * 4}")
    val (nMeta, tMeta) = timeMin(Multimodal.videoMetadata(spark, mp4).count())
    out += f"videoMetadata(MP4 mix): $nMeta%d rows in $tMeta%.2f s (${nMeta / tMeta}%.0f rows/s; incl. avc1 metadata, no frame copies)"
    require(nMeta == vidRows - vidRows / 10, s"mp4 meta=$nMeta")

    println("== MediaScaleProbe ==")
    out.result().foreach(println)
    spark.stop()
  }
}
