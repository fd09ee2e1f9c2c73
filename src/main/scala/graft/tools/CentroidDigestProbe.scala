package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ivf.{IndexStore, IvfBuilder}

/** Byte-stability gate for k-means/centroid code changes: build the IVF
  * index over a fixture table and print the centroid digest + first
  * centroid values. Run before and after a kernel/trainer change (git
  * stash A/B) — equal digests prove the change left every produced
  * centroid byte-for-byte identical, which the same-run determinism specs
  * cannot see. Used r11 to pin the early-abandon pruning
  * ([[graft.functions.VectorKernels.nearestCentroid]],
  * `KMeans.squaredL2FlatBounded`) as result-identical.
  */
object CentroidDigestProbe {
  def main(args: Array[String]): Unit = {
    val table = args.headOption.getOrElse("/root/testdata/sf0.01/embeddings.parquet")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val storeDir = java.nio.file.Files.createTempDirectory("graft-cdigest").toString
    val t0 = System.nanoTime()
    val built = IvfBuilder.build(
      spark, table, IvfBuilder.Config("embedding"), new IndexStore(storeDir))
    val sec = (System.nanoTime() - t0) / 1e9
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val bb = java.nio.ByteBuffer.allocate(built.centroids.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    built.centroids.foreach(bb.putFloat)
    val digest = md.digest(bb.array()).take(16).map("%02x".format(_)).mkString
    println(f"""{"metric":"centroid_digest","table":"$table","k":${built.nClusters},"dim":${built.dim},"build_sec":$sec%.2f,"digest":"$digest","head":[${built.centroids.take(4).mkString(",")}]}""")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(storeDir))
    spark.stop()
  }
}
