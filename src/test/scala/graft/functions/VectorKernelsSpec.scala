package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class VectorKernelsSpec extends AnyFunSuite {

  // Reference unit fixture: /root/reference/src/ivf/index.rs:487-493
  test("squared L2 of [1,2,3] vs [4,5,6] is 27") {
    val d = VectorKernels.squaredL2(Array(1f, 2f, 3f), Array(4f, 5f, 6f))
    assert(math.abs(d - 27.0f) < 1e-6)
  }

  test("l2 distance is sqrt of squared") {
    val d = VectorKernels.l2Distance(Array(1f, 2f, 3f), Array(4f, 5f, 6f))
    assert(math.abs(d - math.sqrt(27.0).toFloat) < 1e-6)
  }

  test("unrolled loop handles non-multiple-of-4 dims") {
    for (dim <- 1 to 9) {
      val a = Array.tabulate(dim)(i => i.toFloat)
      val b = Array.tabulate(dim)(i => (i + 1).toFloat)
      assert(VectorKernels.squaredL2(a, b) == dim.toFloat)
    }
  }

  test("cosine of identical vectors is 1, zero norm yields 0") {
    val v = Array(1f, 2f, 3f)
    assert(math.abs(VectorKernels.cosine(v, v) - 1.0f) < 1e-6)
    assert(VectorKernels.cosine(v, Array(0f, 0f, 0f)) == 0.0f)
  }

  test("nearestCentroid picks the argmin over a flat matrix") {
    val centroids = Array(0f, 0f, /* c0 */ 10f, 10f /* c1 */ )
    assert(VectorKernels.nearestCentroid(Array(1f, 1f), centroids, 2) == 0)
    assert(VectorKernels.nearestCentroid(Array(9f, 9f), centroids, 2) == 1)
  }

  // The early-abandon claim is bit-exactness vs the unpruned scan: same
  // winner, same first-index tie-break, across odd dims (block boundary
  // edge), duplicated centroids (exact ties), and clustered + uniform data.
  test("nearestCentroid early-abandon matches the unpruned scan exactly") {
    def naive(vec: Array[Float], cents: Array[Float], dim: Int): Int = {
      val k = cents.length / dim
      var best = 0
      var bestDist = Float.PositiveInfinity
      var c = 0
      while (c < k) {
        var sum = 0.0f
        var i = 0
        while (i < dim) { val d = vec(i) - cents(c * dim + i); sum += d * d; i += 1 }
        if (sum < bestDist) { bestDist = sum; best = c }
        c += 1
      }
      best
    }
    val rnd = new scala.util.Random(41)
    for (dim <- Seq(1, 3, 31, 32, 33, 67); k <- Seq(1, 7, 50)) {
      val cents = Array.fill(k * dim)(rnd.nextFloat() * 10f - 5f)
      // force exact ties: duplicate centroid 0 into the last slot
      if (k > 1) System.arraycopy(cents, 0, cents, (k - 1) * dim, dim)
      for (_ <- 0 until 50) {
        // mix clustered (near a random centroid) and uniform query points
        val vec =
          if (rnd.nextBoolean()) Array.fill(dim)(rnd.nextFloat() * 10f - 5f)
          else {
            val c = rnd.nextInt(k)
            Array.tabulate(dim)(i => cents(c * dim + i) + rnd.nextFloat() * 0.1f)
          }
        assert(VectorKernels.nearestCentroid(vec, cents, dim) == naive(vec, cents, dim))
      }
      // a query equidistant from the duplicated pair must resolve to index 0
      if (k > 1)
        assert(VectorKernels.nearestCentroid(
          java.util.Arrays.copyOfRange(cents, 0, dim), cents, dim) == 0)
    }
  }

  // Same bit-exactness claim for the top-p kernel: the pruned insertion
  // scan must reproduce the full-scan selection sort's lexicographic
  // (dist, index) order — including exact ties from duplicated centroids.
  test("nearestCentroids early-abandon matches the full-scan selection exactly") {
    def naive(vec: Array[Float], cents: Array[Float], dim: Int, p: Int): Array[Int] = {
      val k = cents.length / dim
      val dists = Array.tabulate(k) { c =>
        var sum = 0.0f
        var i = 0
        while (i < dim) { val d = vec(i) - cents(c * dim + i); sum += d * d; i += 1 }
        sum
      }
      val take = math.min(p, k)
      val order = Array.tabulate(k)(identity)
      var s = 0
      while (s < take) {
        var best = s
        var t = s + 1
        while (t < k) {
          if (dists(order(t)) < dists(order(best)) ||
            (dists(order(t)) == dists(order(best)) && order(t) < order(best))) best = t
          t += 1
        }
        val tmp = order(s); order(s) = order(best); order(best) = tmp
        s += 1
      }
      java.util.Arrays.copyOfRange(order, 0, take)
    }
    val rnd = new scala.util.Random(43)
    for (dim <- Seq(1, 3, 32, 33, 67); k <- Seq(1, 4, 50); p <- Seq(1, 4, 16, 64)) {
      val cents = Array.fill(k * dim)(rnd.nextFloat() * 10f - 5f)
      if (k > 2) { // duplicate centroid 1 into the last slot: exact tie
        System.arraycopy(cents, dim, cents, (k - 1) * dim, dim)
      }
      for (_ <- 0 until 40) {
        val vec =
          if (rnd.nextBoolean()) Array.fill(dim)(rnd.nextFloat() * 10f - 5f)
          else {
            val c = rnd.nextInt(k)
            Array.tabulate(dim)(i => cents(c * dim + i) + rnd.nextFloat() * 0.1f)
          }
        val got = VectorKernels.nearestCentroids(vec, cents, dim, p)
        val want = naive(vec, cents, dim, p)
        assert(got.toSeq == want.toSeq, s"dim=$dim k=$k p=$p")
      }
    }
  }
}
