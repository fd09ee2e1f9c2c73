package graft.ivf

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.functions.VectorKernels

class DistributedKMeansSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  private def writeCorpus(n: Int, seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    val dir = Files.createTempDirectory("graft-dkm").toString
    (0 until n).map { i =>
      val center = (i % 5) * 3.0f
      (i.toLong, Seq.tabulate(dim)(_ => center + rnd.nextFloat()))
    }.toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
      .repartition(4)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def vecsOf(dir: String): DataFrame =
    spark.read.parquet(dir).select(col("vec").cast("array<float>").as("_vec"))

  /** Within-cluster SSE of `cents` over the full corpus. */
  private def sse(dir: String, cents: Array[Float], k: Int): Double =
    vecsOf(dir).as[Array[Float]].collect().map { v =>
      val c = VectorKernels.nearestCentroid(v, cents, dim)
      VectorKernels
        .squaredL2(v, java.util.Arrays.copyOfRange(cents, c * dim, (c + 1) * dim))
        .toDouble
    }.sum

  test("distributed Lloyd never increases full-corpus SSE over the sample seed") {
    val dir = writeCorpus(2000, 41)
    val store0 = new IndexStore(Files.createTempDirectory("graft-dkm-s0").toString)
    val store1 = new IndexStore(Files.createTempDirectory("graft-dkm-s1").toString)
    val sampleOnly = IvfBuilder.build(
      spark, dir, IvfBuilder.Config("vec", nClusters = Some(10)), store0)
    val refined = IvfBuilder.build(
      spark, dir,
      IvfBuilder.Config("vec", nClusters = Some(10), distributedIters = 5), store1)
    val sseSample = sse(dir, sampleOnly.centroids, 10)
    val sseRefined = sse(dir, refined.centroids, 10)
    assert(
      sseRefined <= sseSample * (1.0 + 1e-9),
      s"refined SSE $sseRefined > sample SSE $sseSample")
    // the index built from refined centroids is still a valid partition of
    // all rows (exactness never depended on centroid quality)
    val files = IndexManager.listFiles(spark, dir)
    val total = files
      .map(f => IndexManager.loadIndex(store1, f, "vec").numRows).sum
    assert(total == 2000L)
  }

  test("AUTO distributed policy: off for small/covered corpora, on past 10x the sample") {
    // explicit values pass through untouched, never flag auto
    assert(IvfBuilder.resolveDistributedIters(0, 5000000L, 100000L) == (0, false))
    assert(IvfBuilder.resolveDistributedIters(7, 5000000L, 100000L) == (7, false))
    // auto: sample covers the corpus -> sample-only (small tables bit-unchanged)
    assert(IvfBuilder.resolveDistributedIters(-1, 50000L, 50000L) == (0, false))
    // auto: truncated sample but corpus < 10x sample -> still sample-only
    assert(IvfBuilder.resolveDistributedIters(-1, 500000L, 100000L) == (0, false))
    // auto: corpus >= 10x sample -> distributed rounds engage
    assert(IvfBuilder.resolveDistributedIters(-1, 1000000L, 100000L) ==
      (IvfBuilder.AutoDistributedIters, true))
    assert(IvfBuilder.resolveDistributedIters(-1, 5000000L, 100000L) ==
      (IvfBuilder.AutoDistributedIters, true))
    // REALISTIC pairs the 5%-rule actually produces (n = 20·sample when the
    // cap doesn't bind): auto must stay OFF — a bare n >= 10·sample guard is
    // vacuously true for them (the r11 bug: auto engaged on every build,
    // including the sf fixtures, churning small-table centroids)
    assert(IvfBuilder.resolveDistributedIters(-1, 60000L, 3000L) == (0, false))
    assert(IvfBuilder.resolveDistributedIters(-1, 1000000L, 50000L) == (0, false))
    // only the documented domain {-1} ∪ [0, ∞) is accepted
    intercept[IllegalArgumentException](
      IvfBuilder.resolveDistributedIters(-2, 5000000L, 100000L))
  }

  test("empty cells keep their previous centroid") {
    val dir = writeCorpus(300, 43)
    // a seed with one absurd centroid no vector will choose
    val far = Array.fill(dim)(1e6f)
    val near = (0 until 4).flatMap(c => Array.fill(dim)(c * 3.0f + 0.5f)).toArray
    val seed = near ++ far
    val vecs = vecsOf(dir)
    val out = IvfBuilder.lloydDistributed(spark, vecs, seed, dim, 5, iters = 2)
    assert(
      java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(out, 4 * dim, 5 * dim),
        far),
      "empty cell's centroid must pass through unchanged")
    // the live centroids moved toward their data
    assert(!java.util.Arrays.equals(java.util.Arrays.copyOfRange(out, 0, dim), seed.take(dim)))
  }

  test("SSE-delta stop: round count is data-chosen under a cap; relTol=0 never stops early") {
    val dir = writeCorpus(2000, 53)
    val vecs = vecsOf(dir)
    val seed = (0 until 5).flatMap(c => Array.fill(dim)(c * 3.0f + 0.4f)).toArray
    // a near-converged seed (cluster centers of the generator) under a huge
    // tolerance: the stop must cut the loop well before the cap...
    val (withStop, curve) = IvfBuilder.lloydDistributedWithCurve(
      spark, vecs, seed, dim, 5, iters = 10, relTol = 0.5)
    assert(curve.length < 10, s"stop never engaged: ${curve.length} rounds")
    assert(curve.length >= 2, "the stop needs two rounds to see a delta")
    // ...while relTol=0 runs every configured round (explicit-config path)
    val (noStop, fullCurve) = IvfBuilder.lloydDistributedWithCurve(
      spark, vecs, seed, dim, 5, iters = 4, relTol = 0.0)
    assert(fullCurve.length == 4, s"explicit rounds must all run: $fullCurve")
    // the curve is the per-round assignment SSE: monotone non-increasing
    assert(fullCurve.zip(fullCurve.tail).forall { case (a, b) => b <= a * (1 + 1e-9) },
      s"SSE curve must not increase: $fullCurve")
    // the stopped result equals running exactly that many rounds (the stop
    // decides only whether to buy another scan, never alters a round)
    val (same, _) = IvfBuilder.lloydDistributedWithCurve(
      spark, vecs, seed, dim, 5, iters = curve.length, relTol = 0.0)
    assert(withStop.toSeq == same.toSeq)
    assert(noStop.length == seed.length)
  }

  test("SSE == 0 satisfies the stop (degenerate corpus never pays the full round cap)") {
    // constant corpus: every vector identical, k=1 — assignment SSE hits
    // exactly 0.0 once the centroid lands on the point; the stop's
    // multiplicative form (prevSse - sse <= relTol * prevSse) must accept
    // 0 <= 0 instead of dividing by zero its way into all 10 rounds
    val dir = Files.createTempDirectory("graft-kmeans-const").toString
    import spark.implicits._
    (0 until 500).map(_ => (1L, Seq.fill(dim)(0.25f)))
      .toDF("id", "vec")
      .select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("vec").cast("array<float>").as("vec"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val vecs = vecsOf(dir)
    val seed = Array.fill(dim)(0.9f) // off the point: round 1 SSE > 0
    val (cents, curve) = IvfBuilder.lloydDistributedWithCurve(
      spark, vecs, seed, dim, 1, iters = 10, relTol = 0.005)
    assert(curve.length <= 3, s"zero-SSE corpus must stop early: $curve")
    assert(curve.last == 0.0, s"constant corpus converges to SSE 0: $curve")
    assert(cents.forall(c => math.abs(c - 0.25f) < 1e-6))
  }

  test("deterministic for a fixed file layout") {
    val dir = writeCorpus(800, 47)
    val vecs = vecsOf(dir)
    val seed = (0 until 6).flatMap(c => Array.fill(dim)(c * 2.0f)).toArray
    val a = IvfBuilder.lloydDistributed(spark, vecs, seed, dim, 6, iters = 3)
    val b = IvfBuilder.lloydDistributed(spark, vecs, seed, dim, 6, iters = 3)
    assert(a.toSeq == b.toSeq)
  }
}
