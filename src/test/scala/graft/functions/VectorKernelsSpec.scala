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
}
