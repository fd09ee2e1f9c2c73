package graft.ivf

import java.nio.{ByteBuffer, ByteOrder}

import graft.functions.VectorKernels

/** In-memory IVF index for one Parquet file.
  *
  * Byte format is identical to the reference engine's so indexes are
  * interchangeable (`/root/reference/src/ivf/index.rs:65-128`):
  * `dim:u32 LE, n_clusters:u32 LE, centroids f32 LE × (k·d),
  *  then per cluster: len:u32 LE + row_id:u32 LE × len`.
  * Framing when persisted (`/root/reference/src/ivf/parquet.rs:105-174`):
  * magic `PQ_VECTOR1` + payload_len:u64 LE + payload.
  *
  * `invertedLists(i)` holds the file-local row ordinals whose nearest
  * centroid is `i`, ascending.
  */
final case class IvfIndex(
    dim: Int,
    nClusters: Int,
    centroids: Array[Float],
    invertedLists: Array[Array[Int]]) {
  require(centroids.length == dim * nClusters, "centroid matrix shape mismatch")
  require(invertedLists.length == nClusters, "inverted list count mismatch")

  /** Indices of the `nprobe` nearest centroids to `query`, ascending by
    * squared L2 (reference: index.rs:130-149).
    */
  def findClosestCentroids(query: Array[Float], nprobe: Int): Array[Int] = {
    val k = math.min(nprobe, nClusters)
    val dists = new Array[Float](nClusters)
    var i = 0
    while (i < nClusters) {
      val off = i * dim
      var sum = 0.0f
      var j = 0
      while (j < dim) { val d = query(j) - centroids(off + j); sum += d * d; j += 1 }
      dists(i) = sum
      i += 1
    }
    (0 until nClusters).sortBy(dists).take(k).toArray
  }

  /** Union of the probed centroids' inverted lists (reference: index.rs:57-63). */
  def candidateRows(query: Array[Float], nprobe: Int): Array[Int] =
    findClosestCentroids(query, nprobe).flatMap(invertedLists)

  /** Indices of the `nprobe` most-aligned centroids by COSINE, descending —
    * the angular probe order for cosine-metric search. Same candidate
    * machinery as [[findClosestCentroids]], different cell ranking: over an
    * index built on unit-normalized vectors this is the proper angular IVF
    * probe; over a raw build it is a norm-insensitive heuristic (and any
    * probe order is exact at `nprobe >= nClusters`). Zero-norm centroids
    * rank last.
    */
  def findClosestCentroidsCosine(query: Array[Float], nprobe: Int): Array[Int] = {
    val k = math.min(nprobe, nClusters)
    var qn = 0.0f
    var j = 0
    while (j < dim) { qn += query(j) * query(j); j += 1 }
    val negSims = new Array[Float](nClusters)
    var i = 0
    while (i < nClusters) {
      val off = i * dim
      var dot = 0.0f
      var cn = 0.0f
      j = 0
      while (j < dim) {
        val c = centroids(off + j)
        dot += query(j) * c
        cn += c * c
        j += 1
      }
      val denom = math.sqrt(qn.toDouble) * math.sqrt(cn.toDouble)
      negSims(i) =
        if (denom == 0.0) Float.MaxValue else -(dot / denom.toFloat)
      i += 1
    }
    (0 until nClusters).sortBy(negSims).take(k).toArray
  }

  /** Union of the cosine-probed centroids' inverted lists. */
  def candidateRowsCosine(query: Array[Float], nprobe: Int): Array[Int] =
    findClosestCentroidsCosine(query, nprobe).flatMap(invertedLists)

  /** Cells that can possibly hold a member within `radius` (true L2) of
    * `query`, by the triangle inequality: every member x of cell i satisfies
    * `d(q, x) >= d(q, c_i) − radius_i`, so a cell with
    * `d(q, c_i) > radius + radius_i` holds no in-range member and is pruned
    * EXACTLY — range search over the surviving cells equals a full scan.
    * `radii(i)` is cell i's max member-to-centroid distance (the sidecar
    * [[IndexStore.loadRadii]] persists); `None` (no sidecar, e.g. a
    * reference-built index) probes every non-empty cell, still exact. The
    * small relative margin absorbs f32 rounding in the distance kernels so
    * a boundary member is never lost to the last bit.
    */
  def rangeProbeCells(
      query: Array[Float], radius: Float, radii: Option[Array[Float]]): Array[Int] = {
    val bounds = radii match {
      case Some(r) =>
        require(
          r.length == nClusters,
          s"radii length ${r.length} != n_clusters $nClusters")
        r
      case None => null
    }
    val out = Array.newBuilder[Int]
    var i = 0
    while (i < nClusters) {
      if (invertedLists(i).length > 0) {
        if (bounds == null) out += i
        else {
          val off = i * dim
          var sum = 0.0f
          var j = 0
          while (j < dim) { val d = query(j) - centroids(off + j); sum += d * d; j += 1 }
          val dqc = math.sqrt(sum.toDouble)
          val keep = radius.toDouble + bounds(i).toDouble
          if (dqc <= keep * (1.0 + 1e-5) + 1e-6) out += i
        }
      }
      i += 1
    }
    out.result()
  }

  /** Number of candidates a probe would return, without materializing them —
    * the cheap first phase of the distributed `max_candidates` fairness cap.
    * `cosine` counts under the angular probe order (different cells survive
    * at `nprobe < nClusters`; identical at exhaustive probe).
    */
  def candidateCount(query: Array[Float], nprobe: Int, cosine: Boolean = false): Long =
    (if (cosine) findClosestCentroidsCosine(query, nprobe)
     else findClosestCentroids(query, nprobe))
      .map(invertedLists(_).length.toLong).sum

  def numRows: Long = invertedLists.iterator.map(_.length.toLong).sum

  def toBytes: Array[Byte] = {
    val payloadLen = 8 + 4 * centroids.length +
      invertedLists.map(l => 4 + 4 * l.length).sum
    val buf = ByteBuffer.allocate(payloadLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(dim)
    buf.putInt(nClusters)
    centroids.foreach(buf.putFloat)
    invertedLists.foreach { list =>
      buf.putInt(list.length)
      list.foreach(buf.putInt)
    }
    buf.array()
  }

  def nearestCentroid(vec: Array[Float]): Int =
    VectorKernels.nearestCentroid(vec, centroids, dim)

  /** Fingerprint of the centroid matrix (plus shape) — the index's "epoch".
    * Derived artifacts whose bytes are a function of the centroids (residual
    * PQ codes, per-cell radius bounds) stamp this into their headers so a
    * retrain that moves the centroids invalidates them instead of letting
    * them silently mis-score (the refuse-don't-guess posture of the
    * reference's indexed-column validation, index_exec.rs:123-135).
    */
  lazy val centroidDigest: Long = IvfIndex.centroidDigest(dim, nClusters, centroids)
}

object IvfIndex {
  val Magic: Array[Byte] = "PQ_VECTOR1".getBytes("UTF-8")
  val IndexOffsetKey = "pq_vector_index_offset"
  val EmbeddingColumnKey = "pq_vector_embedding_column"

  /** FNV-1a over the shape and the raw f32 bit patterns — stable across
    * JVMs/platforms (bit-exact centroids ⇒ equal digest; any moved centroid
    * ⇒ different with overwhelming probability). NaN payload bits count as
    * written, so even exotic centroids fingerprint deterministically.
    */
  def centroidDigest(dim: Int, nClusters: Int, centroids: Array[Float]): Long = {
    var h = 0xcbf29ce484222325L
    def mix(v: Int): Unit = {
      var i = 0
      while (i < 4) {
        h ^= (v >>> (i * 8)) & 0xFFL
        h *= 0x100000001b3L
        i += 1
      }
    }
    mix(dim)
    mix(nClusters)
    var c = 0
    while (c < centroids.length) {
      mix(java.lang.Float.floatToRawIntBits(centroids(c)))
      c += 1
    }
    h
  }

  def fromBytes(bytes: Array[Byte]): IvfIndex = {
    require(bytes.length >= 8, "IVF index buffer too small")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dim = buf.getInt
    val nClusters = buf.getInt
    require(dim > 0, s"invalid dim $dim")
    require(nClusters > 0, s"invalid n_clusters $nClusters")
    // long-math shape check: corrupt headers otherwise surface as a raw
    // NegativeArraySizeException (dim·k wrapping Int) or BufferUnderflow
    // deep in the float loop instead of an actionable message
    require(8L + 4L * dim * nClusters <= bytes.length,
      s"centroid matrix (dim=$dim × k=$nClusters) exceeds the ${bytes.length}-byte payload " +
        "— corrupt or truncated index")
    val centroids = new Array[Float](dim * nClusters)
    var i = 0
    while (i < centroids.length) { centroids(i) = buf.getFloat; i += 1 }
    val lists = new Array[Array[Int]](nClusters)
    var c = 0
    while (c < nClusters) {
      val len = buf.getInt
      val list = new Array[Int](len)
      var j = 0
      while (j < len) { list(j) = buf.getInt; j += 1 }
      lists(c) = list
      c += 1
    }
    IvfIndex(dim, nClusters, centroids, lists)
  }

  /** Wrap payload with the reference's persist framing: magic + u64 LE length. */
  def frame(payload: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer
      .allocate(Magic.length + 8 + payload.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(Magic)
    buf.putLong(payload.length.toLong)
    buf.put(payload)
    buf.array()
  }

  /** Parse framed bytes (magic + length + payload) back into an index. */
  def unframe(framed: Array[Byte]): IvfIndex = {
    require(framed.length >= Magic.length + 8, "framed index too small")
    require(
      framed.view.slice(0, Magic.length).sameElements(Magic),
      "bad index magic — not a PQ_VECTOR1 index")
    val buf = ByteBuffer.wrap(framed).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(Magic.length)
    val len = buf.getLong
    require(
      len >= 0 && len <= framed.length - Magic.length - 8,
      s"index length $len exceeds buffer")
    val payload = new Array[Byte](len.toInt)
    buf.get(payload)
    fromBytes(payload)
  }
}
