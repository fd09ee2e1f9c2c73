package graft.ivf

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.channels.FileChannel
import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PQ code sidecar: the product-quantized twin of a file's embedding column
  * — `m` BYTES per row (vs `4·dim` for floats), dense in row-ordinal order
  * for O(1) random access, with the table-shared codebook embedded so each
  * sidecar is self-contained.
  *
  * Storage half of IVF-PQ search ([[VectorTopK.searchPq]]): coarse ranking
  * reads `m` bytes per candidate and scores them with ADC table lookups;
  * full-precision floats are touched only for the `k·oversample` refine
  * survivors. At dim=64, m=8 this is a 32× coarse-IO reduction over floats
  * (8× over SQ8).
  *
  * MEASURED ENVELOPE (TierIoProbe at 1M×1024, round-10 BENCHNOTES): PQ is
  * the demonstrated COLD/remote tier — on a single-file by-cell layout it
  * beats float selective at every cold bandwidth (0.66 vs 1.04 s cold
  * NVMe; 3.77 vs 4.49 at 25 MB/s). Caveats: multi-file layouts erase the
  * win (per-file codebook/sidecar loads — keep cold tables few-file), and
  * on a warm page cache float selective stays faster.
  *
  * Layout (little-endian): `"GRAFTPQ3" | nRows i32 | flags i32 |
  * centroidDigest i64 | cbLen i32 | codebook bytes ([[Pq.codebookBytes]]) |
  * codes (nRows·m bytes)`.
  * `flags` bit 0 = RESIDUAL: codes quantize `vec − cellCentroid` (IVF-ADC,
  * the faiss `IndexIVFPQ` convention) and search must build its ADC table
  * from `query − cellCentroid` per probed cell. Residual codes are a
  * function of the IVF centroids at encode time, so `centroidDigest` stamps
  * the [[IvfIndex.centroidDigest]] they were built under; readers REFUSE a
  * mismatch (a drift retrain moved the centroids — scoring old-centroid
  * codes against new-centroid ADC tables silently collapses recall) and
  * [[ensure]] rebuilds it. Non-residual sidecars don't depend on the
  * centroids and stamp 0.
  * Writes are atomic (temp + rename), safe under speculative retries.
  */
object PqSidecar {

  // "3": the centroidDigest field was added (epoch-stamping residual codes);
  // readers treat a bad magic as sidecar-absent, so pre-digest files are
  // transparently rebuilt by ensure() rather than misparsed
  val Magic: Array[Byte] = "GRAFTPQ3".getBytes("UTF-8")
  private val FixedHeaderLen = Magic.length + 20

  val FlagResidual = 1

  /** Immutable view of a sidecar's header. */
  final case class Header(
      cb: Pq.Codebook, nRows: Int, flags: Int, centroidDigest: Long, codesOffset: Long) {
    def residual: Boolean = (flags & FlagResidual) != 0
  }

  def writeFile(
      path: String,
      cb: Pq.Codebook,
      codes: Array[Byte],
      flags: Int = 0,
      centroidDigest: Long = 0L): Unit = {
    require(
      codes.length % cb.m == 0,
      s"codes length ${codes.length} not a multiple of m ${cb.m}")
    val cbBytes = Pq.codebookBytes(cb)
    val buf = ByteBuffer
      .allocate(FixedHeaderLen + cbBytes.length + codes.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(Magic)
    buf.putInt(codes.length / cb.m)
    buf.putInt(flags)
    buf.putLong(centroidDigest)
    buf.putInt(cbBytes.length)
    buf.put(cbBytes)
    buf.put(codes)
    val target = Paths.get(path)
    Files.createDirectories(target.getParent)
    val tmp = Paths.get(path + s".tmp-${java.util.UUID.randomUUID()}")
    Files.write(tmp, buf.array())
    Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  def readHeader(path: String): Header = {
    val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
    try readHeader(ch, path) finally ch.close()
  }

  private def readHeader(ch: FileChannel, path: String): Header = {
    val fixed = ByteBuffer.allocate(FixedHeaderLen).order(ByteOrder.LITTLE_ENDIAN)
    while (fixed.hasRemaining && ch.read(fixed) >= 0) {}
    require(!fixed.hasRemaining, s"truncated PQ sidecar $path")
    fixed.flip()
    val magic = new Array[Byte](Magic.length)
    fixed.get(magic)
    require(magic.sameElements(Magic), s"not a PQ sidecar: $path")
    val nRows = fixed.getInt
    val flags = fixed.getInt
    val centroidDigest = fixed.getLong
    val cbLen = fixed.getInt
    require(nRows >= 0 && cbLen > 0, s"implausible PQ header in $path")
    val cbBuf = ByteBuffer.allocate(cbLen)
    var pos = FixedHeaderLen.toLong
    while (cbBuf.hasRemaining) {
      val n = ch.read(cbBuf, pos)
      require(n >= 0, s"unexpected EOF reading PQ codebook in $path")
      pos += n
    }
    Header(
      Pq.codebookFromBytes(cbBuf.array()), nRows, flags, centroidDigest,
      FixedHeaderLen.toLong + cbLen)
  }

  /** Open-once reader: holds the channel and the parsed header so repeated
    * `rows()` calls (one per probed cell in residual search) don't reopen
    * the file and re-deserialize the codebook each time. Not thread-safe;
    * one per task.
    */
  final class Reader(path: String) extends AutoCloseable {
    private val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
    val header: Header =
      try PqSidecar.readHeader(ch, path)
      catch { case e: Throwable => ch.close(); throw e }

    /** Codes of `ordinals` (sorted ascending, file-local), one positioned
      * read per consecutive-ordinal run (same IO coalescing as
      * [[Sq8Sidecar]]).
      */
    def rows(ordinals: Array[Int]): Array[Array[Byte]] = {
      if (ordinals.isEmpty) return Array.empty
      require(
        ordinals.last < header.nRows && ordinals.head >= 0,
        s"ordinal out of range [0, ${header.nRows}) in $path")
      val m = header.cb.m
      val out = new Array[Array[Byte]](ordinals.length)
      var i = 0
      while (i < ordinals.length) {
        var j = i
        while (j + 1 < ordinals.length && ordinals(j + 1) == ordinals(j) + 1) j += 1
        val run = ByteBuffer.allocate((j - i + 1) * m)
        var pos = header.codesOffset + ordinals(i).toLong * m
        while (run.hasRemaining) {
          val n = ch.read(run, pos)
          require(n >= 0, s"unexpected EOF in $path")
          pos += n
        }
        val bytes = run.array()
        var r = i
        while (r <= j) {
          out(r) = java.util.Arrays.copyOfRange(bytes, (r - i) * m, (r - i + 1) * m)
          r += 1
        }
        i = j + 1
      }
      out
    }

    override def close(): Unit = ch.close()
  }

  /** One-shot convenience over [[Reader]]. */
  def readRows(path: String, ordinals: Array[Int]): (Header, Array[Array[Byte]]) = {
    val reader = new Reader(path)
    try (reader.header, reader.rows(ordinals))
    finally reader.close()
  }

  /** Build the per-file PQ sidecars: ONE codebook trained on a driver-side
    * bounded sample (the IVF build's sample discipline — table-shared, like
    * the centroid set), then a distributed encode pass; the shuffle and the
    * per-file buffer carry `m` bytes per row, and sidecars are written FROM
    * THE EXECUTOR. `only` restricts the scan for incremental appends (the
    * codebook still trains on the whole table so codes stay comparable).
    */
  def build(
      spark: SparkSession,
      path: String,
      column: String,
      m: Int,
      store: IndexStore = IndexStore.default,
      maxIters: Int = 20,
      seed: Long = 42L,
      only: Option[Seq[String]] = None,
      residual: Boolean = false): Map[String, Long] = {
    import spark.implicits._
    val all = spark.read
      .parquet(path)
      .select(
        col("_metadata.file_path").as("_file"),
        col("_metadata.row_index").as("_ri"),
        col(column).cast("array<float>").as("_vec"))
    val (n, dim) = IvfBuilder.validate(all, column)
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")

    // residual (IVF-ADC) mode quantizes vec − cellCentroid under the
    // table-shared IVF centroids — the index must already exist, and every
    // file's index must carry the SAME centroid set (encode uses one file's
    // copy but search builds ADC tables from each file's own index — a
    // mixed-generation table would silently mis-rank, so verify the
    // invariant by fingerprint before encoding anything)
    val (centroids, centroidEpoch): (Array[Float], Long) =
      if (!residual) (null, 0L)
      else {
        val files = IndexManager.listFiles(spark, path)
        val digests = files.map { f =>
          // header-only peek for sidecars; the footer-embedded fallback
          // goes through the decoded-index LRU so repeated ensure() calls
          // don't re-decode posting lists driver-side
          f -> store.centroidDigest(f, column)
            .orElse(scala.util.Try(
              IndexManager.loadIndex(store, f, column).centroidDigest).toOption)
            .getOrElse(throw new IllegalStateException(
              s"residual PQ needs an IVF index for every file — none for $f"))
        }
        val epoch = digests.head._2
        digests.find(_._2 != epoch).foreach { case (f, d) =>
          throw new IllegalStateException(
            s"mixed-generation IVF indexes: $f has centroid digest $d but " +
              s"${digests.head._1} has $epoch — residual PQ codes must share one " +
              "centroid set; rebuild the table's index (IvfBuilder.build) first")
        }
        (IndexManager.loadIndex(store, files.head, column).centroids, epoch)
      }
    def toResidual(vec: Array[Float], cents: Array[Float]): Array[Float] = {
      val cell = graft.functions.VectorKernels.nearestCentroid(vec, cents, dim)
      Pq.residual(
        vec, java.util.Arrays.copyOfRange(cents, cell * dim, (cell + 1) * dim))
    }

    // bounded training sample, deterministic (sorted before train)
    val sampleSize = math.min(math.max(n / 20L, math.min(n, Pq.MaxK.toLong)), 100000L)
    val rawSamples: Array[Array[Float]] =
      if (sampleSize >= n) {
        all.sort("_file", "_ri").select("_vec").as[Array[Float]].collect()
      } else {
        val frac = math.min(1.0, (sampleSize.toDouble * 1.5) / n.toDouble)
        val sampled = all
          .sample(withReplacement = false, frac, seed)
          .sort("_file", "_ri")
          .select("_vec")
          .as[Array[Float]]
          .take(sampleSize.toInt)
        if (sampled.nonEmpty) sampled
        else all.sort("_file", "_ri").select("_vec").as[Array[Float]].take(sampleSize.toInt)
      }
    val samples =
      if (residual) rawSamples.map(toResidual(_, centroids)) else rawSamples
    val cb = Pq.train(samples, m, maxIters, seed)
    val bcCb = spark.sparkContext.broadcast(cb)
    val bcCents = spark.sparkContext.broadcast(centroids)
    val flags = if (residual) FlagResidual else 0

    val vecs = only.fold(all)(fs => all.where(col("_file").isin(fs: _*)))
    vecs
      .as[(String, Long, Array[Float])]
      .map { case (file, ri, vec) =>
        require(
          ri <= Int.MaxValue,
          s"row ordinal $ri in $file exceeds the sidecar's 2^31 rows-per-file limit " +
            "(header stores nRows as i32) — split the file")
        val target =
          if (bcCents.value == null) vec else toResidual(vec, bcCents.value)
        (file, ri.toInt, Pq.encode(target, bcCb.value))
      }
      .groupByKey(_._1)
      .mapGroups { (file, rows) =>
        val codebook = bcCb.value
        val collected = rows.map { case (_, ri, c) => (ri, c) }.toArray
        val codes = new Array[Byte](collected.length * codebook.m)
        collected.foreach { case (ri, c) =>
          System.arraycopy(c, 0, codes, ri * codebook.m, codebook.m)
        }
        writeFile(
          store.pqPath(file, column, residual = flags != 0), codebook, codes, flags,
          centroidEpoch)
        (file, collected.length.toLong)
      }
      .collect()
      .toMap
  }

  /** Build sidecars ONLY for files that lack one (idempotent, incremental).
    * NOTE: an append-triggered build re-trains on the grown table; existing
    * sidecars keep their original codebook (self-contained), so cross-file
    * ADC stays valid per file — the refine phase re-ranks in exact float
    * space, which is what guarantees cross-file comparability.
    */
  /** A sidecar is usable when present AND parseable with the wanted
    * variant flag AND (for residual codes) stamped with the CURRENT index's
    * centroid digest — a stale (old-format), wrong-variant, or
    * wrong-centroid-epoch file (index retrained since encode) counts as
    * missing and gets rebuilt instead of silently mis-scoring.
    */
  private[graft] def usable(store: IndexStore, f: String, column: String, residual: Boolean): Boolean =
    store.existsPq(f, column, residual) &&
      scala.util.Try(readHeader(store.pqPath(f, column, residual))).toOption.exists { h =>
        h.residual == residual && (!residual ||
          store.centroidDigest(f, column)
            .orElse(scala.util.Try(
              IndexManager.loadIndex(store, f, column).centroidDigest).toOption)
            .contains(h.centroidDigest))
      }

  def ensure(
      spark: SparkSession,
      path: String,
      column: String,
      m: Int,
      store: IndexStore = IndexStore.default,
      residual: Boolean = false): Unit = {
    val missing = IndexManager.listFiles(spark, path)
      .filterNot(f => usable(store, f, column, residual))
    if (missing.nonEmpty) {
      build(spark, path, column, m, store, only = Some(missing), residual = residual): Unit
    }
  }
}
