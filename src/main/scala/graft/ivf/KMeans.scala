package graft.ivf

import java.util.Random

/** Seeded k-means++ with Lloyd refinement, run driver-side on a bounded
  * sample (the reference does the same: k-means on a ≤100k-row sample, then
  * a full distributed assignment pass — `/root/reference/src/ivf/index.rs:
  * 152-214, 322-457`). Deterministic for a fixed seed, which is what makes
  * `nprobe = nClusters` exactness tests and cross-run index reuse stable.
  *
  * Data layout: flat row-major `Array[Float]` (n × dim), like the
  * reference's `Embeddings` (`src/ivf/mod.rs:72-102`).
  */
object KMeans {

  /** `init`: optional warm-start centroid matrix (k × dim flat). When set,
    * k-means++ seeding is skipped entirely — Lloyd refines the given
    * centroids (deterministic, no RNG draw). The retrain path of
    * [[IvfBuilder.extendOrRetrain]] uses this to refresh centroid positions
    * under drift without re-seeding from scratch.
    */
  final case class Params(
      nClusters: Int,
      maxIters: Int = 20,
      seed: Long = 42L,
      init: Option[Array[Float]] = None)

  /** Sample `sampleSize` distinct row indices out of `n`, seeded. */
  def sampleIndices(n: Int, sampleSize: Int, rng: Random): Array[Int] = {
    if (sampleSize >= n) return (0 until n).toArray
    // Partial Fisher-Yates over an index array: deterministic, O(n) space
    // (n here is bounded by the caller's sample cap, not table size).
    val idx = (0 until n).toArray
    var i = 0
    while (i < sampleSize) {
      val j = i + rng.nextInt(n - i)
      val t = idx(i); idx(i) = idx(j); idx(j) = t
      i += 1
    }
    java.util.Arrays.copyOfRange(idx, 0, sampleSize)
  }

  private def squaredL2Flat(
      data: Array[Float], row: Int, other: Array[Float], otherOff: Int, dim: Int): Float = {
    var sum = 0.0f
    val off = row * dim
    var j = 0
    while (j < dim) {
      val d = data(off + j) - other(otherOff + j)
      sum += d * d
      j += 1
    }
    sum
  }

  /** [[squaredL2Flat]] with early abandonment against `bound`: returns the
    * EXACT distance (same element-by-element accumulation order, so
    * bit-identical) when it never exceeds `bound` at a 32-element
    * checkpoint, else `Float.PositiveInfinity`. Partial squared-L2 sums are
    * monotone nondecreasing in f32 (each step adds d·d ≥ 0 and IEEE
    * round-to-nearest of `a + b` with `b ≥ 0` is never below `a`), so a
    * pruned candidate's true distance also exceeds `bound` — callers that
    * only act on `d < bound` (the Lloyd argmin, the seeding min-distance
    * update) behave identically, and the k-means result stays byte-for-byte
    * what the unpruned scan produces. Same trick as
    * [[graft.functions.VectorKernels.nearestCentroid]] (r11).
    */
  private def squaredL2FlatBounded(
      data: Array[Float], row: Int, other: Array[Float], otherOff: Int, dim: Int,
      bound: Float): Float = {
    var sum = 0.0f
    val off = row * dim
    var j = 0
    while (j < dim) {
      val lim = math.min(j + 32, dim)
      while (j < lim) {
        val d = data(off + j) - other(otherOff + j)
        sum += d * d
        j += 1
      }
      if (sum > bound) return Float.PositiveInfinity
    }
    sum
  }

  /** k-means++ seeding over an init sample (reference caps at 50k). */
  private def seedPlusPlus(
      data: Array[Float], dim: Int, n: Int, k: Int, rng: Random): Array[Float] = {
    val centroids = new Array[Float](k * dim)
    val initSampleSize = math.max(math.min(n, 50000), k)
    val initIdx =
      if (initSampleSize == n) (0 until n).toArray
      else sampleIndices(n, initSampleSize, rng)

    val first = initIdx(rng.nextInt(initIdx.length))
    System.arraycopy(data, first * dim, centroids, 0, dim)

    val minDist = new Array[Float](initIdx.length)
    var s = 0
    while (s < initIdx.length) {
      minDist(s) = squaredL2Flat(data, initIdx(s), centroids, 0, dim)
      s += 1
    }

    var c = 1
    while (c < k) {
      val prevOff = (c - 1) * dim
      var total = 0.0
      var s2 = 0
      while (s2 < initIdx.length) {
        // bounded: a distance that exceeds the current min can't update it
        val d = squaredL2FlatBounded(data, initIdx(s2), centroids, prevOff, dim, minDist(s2))
        if (d < minDist(s2)) minDist(s2) = d
        total += minDist(s2)
        s2 += 1
      }
      if (total > 0.0) {
        val threshold = rng.nextDouble() * total
        var cumsum = 0.0
        var chosen = initIdx.length - 1
        var s3 = 0
        var found = false
        while (s3 < initIdx.length && !found) {
          cumsum += minDist(s3)
          if (cumsum >= threshold) { chosen = s3; found = true }
          s3 += 1
        }
        System.arraycopy(data, initIdx(chosen) * dim, centroids, c * dim, dim)
      } else {
        val choice = initIdx(rng.nextInt(initIdx.length))
        System.arraycopy(data, choice * dim, centroids, c * dim, dim)
      }
      c += 1
    }
    centroids
  }

  /** k-means++ init (or warm start) + Lloyd iterations (reference:
    * index.rs:322-457). Returns the flat centroid matrix (k × dim).
    */
  def fit(data: Array[Float], dim: Int, params: Params): Array[Float] = {
    val n = data.length / dim
    require(n > 0, "cannot run k-means on zero vectors")
    val k = params.nClusters
    require(k > 0 && k <= n, s"n_clusters $k must be in [1, $n]")
    val centroids = params.init match {
      case Some(warm) =>
        require(
          warm.length == k * dim,
          s"warm-start centroids length ${warm.length} != nClusters $k × dim $dim")
        warm.clone()
      case None => seedPlusPlus(data, dim, n, k, new Random(params.seed))
    }

    // -- Lloyd iterations until stable or maxIters --
    val assignments = new Array[Int](n)
    java.util.Arrays.fill(assignments, -1)
    val next = new Array[Int](n)
    val sizes = new Array[Int](k)
    var iter = 0
    var converged = false
    while (iter < params.maxIters && !converged) {
      var changed = 0
      java.util.Arrays.fill(sizes, 0)
      // assignment is the O(n·k·d) hot phase and each row is independent —
      // parallelize it across cores. Each row's nearest centroid is a pure
      // function of (data, centroids), and rows write disjoint slots, so
      // the result is BIT-IDENTICAL to the sequential loop for any thread
      // schedule (the f32-order-sensitive phases — seeding and centroid
      // accumulation — stay sequential below, preserving every historical
      // fixture byte-for-byte).
      java.util.stream.IntStream.range(0, n).parallel().forEach { r =>
        var best = 0
        var bestDist = Float.PositiveInfinity
        var cc = 0
        while (cc < k) {
          val d = squaredL2FlatBounded(data, r, centroids, cc * dim, dim, bestDist)
          if (d < bestDist) { bestDist = d; best = cc }
          cc += 1
        }
        next(r) = best
      }
      var r = 0
      while (r < n) {
        val best = next(r)
        if (assignments(r) != best) changed += 1
        assignments(r) = best
        sizes(best) += 1
        r += 1
      }
      if (changed == 0) converged = true
      else {
        // empty clusters KEEP their previous position (k-means++ seeds are
        // data points so this is rare there, but a warm-start centroid the
        // data has drifted away from must not collapse to the origin)
        val prev = centroids.clone()
        java.util.Arrays.fill(centroids, 0.0f)
        var r2 = 0
        while (r2 < n) {
          val cOff = assignments(r2) * dim
          val rOff = r2 * dim
          var j = 0
          while (j < dim) { centroids(cOff + j) += data(rOff + j); j += 1 }
          r2 += 1
        }
        var cc2 = 0
        while (cc2 < k) {
          val off = cc2 * dim
          if (sizes(cc2) > 0) {
            val size = sizes(cc2).toFloat
            var j = 0
            while (j < dim) { centroids(off + j) /= size; j += 1 }
          } else {
            System.arraycopy(prev, off, centroids, off, dim)
          }
          cc2 += 1
        }
      }
      iter += 1
    }
    centroids
  }
}
