package graft.ops

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.functions.VectorKernels

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 4
  private val centroids = Array(1f, 1f, 1f, 1f, -1f, -1f, -1f, -1f)

  /** Two tight clusters (near-duplicate masses) plus two isolated docs. */
  private def corpus = {
    val rnd = new scala.util.Random(7)
    val dupA = (0 until 5).map(i => (i.toLong, Seq.fill(dim)(1.0f + rnd.nextFloat() * 0.001f)))
    val dupB = (5 until 9).map(i => (i.toLong, Seq.fill(dim)(-1.0f - rnd.nextFloat() * 0.001f)))
    // isolated: same cells but pointing away enough to be below threshold
    val lone = Seq(
      (9L, Seq(1.0f, 1.0f, -0.9f, -0.9f)),
      (10L, Seq(-1.0f, -1.0f, 0.9f, 0.9f)))
    (dupA ++ dupB ++ lone).toDF("id", "v")
      .select(col("id"), col("v").cast("array<float>").as("v"))
  }

  /** The dominance rule computed directly: drop x when a smaller-id same-cell
    * doc is >= threshold cosine-similar.
    */
  private def bruteKeep(
      rows: Seq[(Long, Array[Float])], threshold: Double): Set[Long] = {
    val cells = rows.map { case (id, v) =>
      id -> VectorKernels.nearestCentroid(v, centroids, dim)
    }.toMap
    val byId = rows.toMap
    rows.map(_._1).filter { id =>
      !rows.exists { case (other, _) =>
        other < id && cells(other) == cells(id) &&
          VectorKernels.cosine(byId(other), byId(id)) >= threshold
      }
    }.toSet
  }

  test("keeps the min-id member of each within-cell duplicate mass") {
    val kept = Dedup.semDedup(corpus, "id", "v", centroids, dim, threshold = 0.99)
      .select("id").as[Long].collect().toSet
    val rows = corpus.select("id", "v").as[(Long, Array[Float])].collect().toSeq
    assert(kept == bruteKeep(rows, 0.99))
    // shape: one survivor per dup mass + the two isolated docs
    assert(kept.contains(0L) && kept.contains(5L))
    assert(kept.contains(9L) && kept.contains(10L))
    assert(!kept.contains(1L) && !kept.contains(6L))
  }

  test("null-vector docs pass through undropped") {
    val withNull = corpus.unionByName(
      Seq((99L, null: Seq[Float])).toDF("id", "v")
        .select(col("id"), col("v").cast("array<float>").as("v")))
    val kept = Dedup.semDedup(withNull, "id", "v", centroids, dim, threshold = 0.99)
      .select("id").as[Long].collect().toSet
    assert(kept.contains(99L))
  }

  test("capped degenerate mass: every drop still has a smaller similar partner") {
    // one near-identical mass far over the cap; the star path engages
    val rnd = new scala.util.Random(11)
    val mass = (0 until 64).map(i =>
      (i.toLong, Seq.fill(dim)(1.0f + rnd.nextFloat() * 0.0001f)))
    val df = mass.toDF("id", "v")
      .select(col("id"), col("v").cast("array<float>").as("v"))
    val kept = Dedup
      .semDedup(df, "id", "v", centroids, dim, threshold = 0.999,
        maxCellSize = 8, starPivots = 4)
      .select("id").as[Long].collect().toSet
    // soundness: doc 0 (global min id) can never be dropped
    assert(kept.contains(0L))
    // the cap may concede drop recall but must still collapse most of an
    // all-pairs-similar mass through its pivots
    assert(kept.size < mass.size / 2, s"kept ${kept.size} of ${mass.size}")
  }

  test("uncapped equals the dominance rule on mixed-margin data") {
    val rnd = new scala.util.Random(13)
    // spread: some similar pairs, some not, across both cells
    val rows = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, Seq.tabulate(dim)(j => base + (rnd.nextFloat() - 0.5f) * (if (i % 5 == 0) 1.5f else 0.01f)))
    }
    val df = rows.toDF("id", "v")
      .select(col("id"), col("v").cast("array<float>").as("v"))
    val kept = Dedup.semDedup(df, "id", "v", centroids, dim, threshold = 0.995)
      .select("id").as[Long].collect().toSet
    val collected = df.select("id", "v").as[(Long, Array[Float])].collect().toSeq
    assert(kept == bruteKeep(collected, 0.995))
  }
}
