package graft.functions

/** Scalar vector kernels shared by the Catalyst expressions, the IVF index
  * build, and the search paths.
  *
  * Distance semantics follow the reference engine
  * (`/root/reference/src/ivf/index.rs:459-480`): squared L2 accumulated in
  * Float32 with a 4-way unrolled loop. `l2Distance` (= sqrt of squared L2)
  * matches the `array_distance` SQL function semantics the reference relies
  * on from its SQL layer.
  */
object VectorKernels {

  /** Squared L2 distance (reference: index.rs:461-480). */
  def squaredL2(a: Array[Float], b: Array[Float]): Float = {
    val len = a.length
    var sum = 0.0f
    var i = 0
    while (i + 4 <= len) {
      val d0 = a(i) - b(i)
      val d1 = a(i + 1) - b(i + 1)
      val d2 = a(i + 2) - b(i + 2)
      val d3 = a(i + 3) - b(i + 3)
      sum += d0 * d0 + d1 * d1 + d2 * d2 + d3 * d3
      i += 4
    }
    while (i < len) {
      val d = a(i) - b(i)
      sum += d * d
      i += 1
    }
    sum
  }

  /** Euclidean (L2) distance — SQL `array_distance` semantics. */
  def l2Distance(a: Array[Float], b: Array[Float]): Float =
    math.sqrt(squaredL2(a, b).toDouble).toFloat

  /** [[squaredL2]] of `a` against `b(bOff ... bOff + a.length)` — the SAME
    * 4-way-unrolled accumulation order, so the result is bit-identical to
    * `squaredL2(a, copyOfRange(b, bOff, bOff + a.length))` without the
    * per-call allocation. Used by the index build's radius pass, whose
    * stored bound must dominate every query-side [[squaredL2]]
    * recomputation exactly.
    */
  def squaredL2Offset(a: Array[Float], b: Array[Float], bOff: Int): Float = {
    val len = a.length
    var sum = 0.0f
    var i = 0
    while (i + 4 <= len) {
      val d0 = a(i) - b(bOff + i)
      val d1 = a(i + 1) - b(bOff + i + 1)
      val d2 = a(i + 2) - b(bOff + i + 2)
      val d3 = a(i + 3) - b(bOff + i + 3)
      sum += d0 * d0 + d1 * d1 + d2 * d2 + d3 * d3
      i += 4
    }
    while (i < len) {
      val d = a(i) - b(bOff + i)
      sum += d * d
      i += 1
    }
    sum
  }

  def dot(a: Array[Float], b: Array[Float]): Float = {
    val len = a.length
    var sum = 0.0f
    var i = 0
    while (i < len) { sum += a(i) * b(i); i += 1 }
    sum
  }

  def norm(a: Array[Float]): Float = math.sqrt(dot(a, a).toDouble).toFloat

  /** Cosine similarity in [-1, 1]; 0 when either vector has zero norm. */
  def cosine(a: Array[Float], b: Array[Float]): Float = {
    val na = norm(a)
    val nb = norm(b)
    if (na == 0.0f || nb == 0.0f) 0.0f else dot(a, b) / (na * nb)
  }

  /** Indices of the `p` nearest centroids in a flat row-major matrix,
    * ascending by (squared L2, index) — the multi-probe generalization of
    * [[nearestCentroid]].
    *
    * Early-abandon pruning against the current p-th best (same monotone
    * partial-sum argument as [[nearestCentroid]]): a centroid whose prefix
    * sum strictly exceeds the incumbent worst kept distance has a final
    * distance strictly above it too, so it can neither enter the top-p nor
    * tie into it — for finite inputs the selected indices and their order
    * are exactly the lexicographic (dist, index) top-p the full scan
    * produces. Survivors keep the element-by-element accumulation order,
    * so kept distances are bit-identical. This is the per-row multi-probe
    * kernel on the `ivfCellPairs`/`ivfKnnJoin` corpus paths — O(n·k·dim)
    * at build/join scale, where the prune cuts the same several-fold as
    * the singular kernel. NaN distances (NaN inputs — rejected upstream by
    * index validation) sort in unspecified positions, as garbage did
    * before.
    */
  def nearestCentroids(
      vec: Array[Float], centroids: Array[Float], dim: Int, p: Int): Array[Int] = {
    val k = centroids.length / dim
    val take = math.min(p, k)
    if (take <= 0) return Array.empty
    // best-so-far kept sorted ascending by (dist, index); insertion keeps
    // the selection-sort tie-break (processing order is ascending c, so an
    // equal-distance newcomer always lands AFTER stored equal entries)
    val bd = new Array[Float](take)
    val bi = new Array[Int](take)
    var filled = 0
    var c = 0
    while (c < k) {
      val off = c * dim
      val bound = if (filled < take) Float.PositiveInfinity else bd(take - 1)
      var sum = 0.0f
      var i = 0
      var pruned = false
      while (i < dim && !pruned) {
        val lim = math.min(i + 32, dim)
        while (i < lim) {
          val d = vec(i) - centroids(off + i)
          sum += d * d
          i += 1
        }
        if (sum > bound) pruned = true
      }
      if (!pruned &&
        (filled < take || sum < bd(take - 1) ||
          (sum == bd(take - 1) && c < bi(take - 1)))) {
        var pos = if (filled < take) filled else take - 1
        while (pos > 0 && (sum < bd(pos - 1) ||
          (sum == bd(pos - 1) && c < bi(pos - 1)))) {
          bd(pos) = bd(pos - 1); bi(pos) = bi(pos - 1)
          pos -= 1
        }
        bd(pos) = sum
        bi(pos) = c
        if (filled < take) filled += 1
      }
      c += 1
    }
    java.util.Arrays.copyOfRange(bi, 0, filled)
  }

  /** Squared L2 against a flat row-major centroid matrix; returns the index
    * of the nearest centroid (reference: index.rs:244-257).
    *
    * Early-abandon pruning: the partial squared-L2 sum is monotone
    * nondecreasing in f32 (each step adds d·d ≥ 0, and IEEE round-to-nearest
    * of `a + b` with `b ≥ 0` is never below `a`), so once a prefix exceeds
    * the incumbent best the centroid's FINAL distance must too, and only a
    * strict `<` replaces the incumbent — abandoning there can change neither
    * the winner nor its tie-break (first index wins an exact tie, and an
    * exact tie is never abandoned because pruning needs strict `>`). For
    * survivors the element-by-element accumulation order is unchanged, so
    * the selected index is bit-identical to the unpruned scan; on clustered
    * data most centroids abandon within a few blocks, cutting the O(n·k·dim)
    * build-assignment passes (the dominant cost of large index builds)
    * several-fold.
    */
  def nearestCentroid(vec: Array[Float], centroids: Array[Float], dim: Int): Int = {
    val k = centroids.length / dim
    var best = 0
    var bestDist = Float.PositiveInfinity
    var c = 0
    while (c < k) {
      val off = c * dim
      var sum = 0.0f
      var i = 0
      var pruned = false
      while (i < dim && !pruned) {
        val lim = math.min(i + 32, dim)
        while (i < lim) {
          val d = vec(i) - centroids(off + i)
          sum += d * d
          i += 1
        }
        if (sum > bestDist) pruned = true
      }
      if (!pruned && sum < bestDist) { bestDist = sum; best = c }
      c += 1
    }
    best
  }
}
