package graft.ivf

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** The per-JVM decoded-index LRU behind [[IndexManager.loadIndex]]:
  * repeated loads of an unchanged sidecar must not re-decode, and any
  * rewrite (atomic-rename sidecar replacement) must read as a miss.
  */
class DecodedIndexCacheSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(): (String, IndexStore) = {
    val dir = Files.createTempDirectory("graft-idxcache").toString
    val rnd = new scala.util.Random(99)
    (0 until 120).map(i => (i.toLong, Seq.fill(8)(rnd.nextFloat())))
      .toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val store = new IndexStore(Files.createTempDirectory("graft-idxcache-store").toString)
    IvfBuilder.build(spark, dir, IvfBuilder.Config("vec", nClusters = Some(4)), store)
    (dir, store)
  }

  test("repeated loads hit the cache and return the same decoded instance") {
    val (dir, store) = fixture()
    val file = IndexManager.listFiles(spark, dir).head
    val first = IndexManager.loadIndex(store, file, "vec")
    val (h0, _) = IndexManager.decodedCacheStats
    val second = IndexManager.loadIndex(store, file, "vec")
    val (h1, _) = IndexManager.decodedCacheStats
    assert(second eq first, "cache must serve the decoded instance, not re-decode")
    assert(h1 == h0 + 1, s"expected one more hit, got $h0 -> $h1")
  }

  test("describeIndex: per-cell sizes sum to rows, radii present, one epoch") {
    val (dir, store) = fixture()
    val desc = IndexManager.describeIndex(spark, dir, "vec", store).collect()
    val file = IndexManager.listFiles(spark, dir).head
    val idx = IndexManager.loadIndex(store, file, "vec")
    assert(desc.length == idx.nClusters)
    assert(desc.map(_.getLong(2)).sum == 120L, "cell sizes must sum to the corpus")
    assert(desc.forall(r => !r.getFloat(3).isNaN), "fresh build writes radii")
    assert(desc.map(_.getLong(4)).distinct.length == 1, "one centroid epoch")
    // stale radii surface as NaN, not wrong bounds
    store.write(file, "vec", idx.copy(centroids = idx.centroids.map(_ + 1.0f)))
    val after = IndexManager.describeIndex(spark, dir, "vec", store).collect()
    assert(after.forall(r => r.getFloat(3).isNaN))
  }

  test("a rewritten sidecar reads as a miss, never a stale hit") {
    val (dir, store) = fixture()
    val file = IndexManager.listFiles(spark, dir).head
    val before = IndexManager.loadIndex(store, file, "vec")
    // same byte length, immediate rewrite — the worst aliasing case; the
    // atomic-rename inode change must still invalidate
    store.write(file, "vec", before.copy(centroids = before.centroids.map(_ + 1.0f)))
    val after = IndexManager.loadIndex(store, file, "vec")
    assert(!(after eq before))
    assert(after.centroidDigest != before.centroidDigest)
    assert(after.centroids(0) == before.centroids(0) + 1.0f)
  }
}
