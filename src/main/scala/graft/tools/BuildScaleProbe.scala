package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.functions.VectorKernels
import graft.ivf.{IndexStore, IvfBuilder}

/** Large-corpus index BUILD probe (round-11 verdict item #5): the round-9
  * 5M×256 probe measured 272 s builds, driver-k-means-bound (single
  * thread, k·sample·dim·iters). The AUTO distributed-Lloyd policy
  * (`Config.distributedIters = -1`, the new default) caps the driver
  * sample Lloyd at [[IvfBuilder.AutoSampleIters]] iterations and runs
  * [[IvfBuilder.AutoDistributedIters]] parallel full-corpus rounds
  * instead. This times the default AUTO build against an explicit
  * `distributedIters = 0` sample-only build on the same corpus, and
  * compares centroid quality via full-corpus SSE (one distributed pass
  * per arm — lower is better; AUTO should be ≤ sample-only since the
  * corpus rounds descend the true objective). Index EXACTNESS does not
  * depend on centroid quality (exhaustive probes are spec-exact under any
  * centroids — vq2); quality moves the recall/candidate-volume curve.
  *
  * NOT part of the round bench (minutes); run manually:
  * `sbt "runMain graft.tools.BuildScaleProbe"` (env:
  * SPARK_GRAFT_SCALE_ROWS/_DIM/_DIR; 5M×256 needs a large driver heap —
  * the r9 probe OOM'd at 8g, use ≥48g).
  */
object BuildScaleProbe {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "5000000").toLong
    val dim = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIM", "256").toInt
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/root/repo/.graft/scale")
    val trueClusters = 64
    val corpus = s"$baseDir/corpus_${rows}x$dim"

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    if (!new java.io.File(corpus).exists())
      ScaleBench.generate(spark, corpus, rows, dim, trueClusters)

    def fullSse(centroids: Array[Float]): Double = {
      val bc = spark.sparkContext.broadcast(centroids)
      val d = dim
      val sse = spark.read.parquet(corpus)
        .select(col("embedding").cast("array<float>"))
        .as[Array[Float]]
        .rdd
        .treeAggregate(0.0)(
          seqOp = { (acc, v) =>
            val c = VectorKernels.nearestCentroid(v, bc.value, d)
            acc + VectorKernels.squaredL2(
              v, java.util.Arrays.copyOfRange(bc.value, c * d, (c + 1) * d)).toDouble
          },
          combOp = _ + _)
      bc.destroy()
      sse
    }

    val out = Seq.newBuilder[String]
    val arms = sys.env.getOrElse("SPARK_GRAFT_BUILD_ARMS", "auto,sample_only")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    arms.map {
      // -1 = the AUTO default; 0 = explicit sample-only (r9 behavior);
      // dN = the auto sample-iter cap + exactly N distributed rounds
      // (maps the SSE-vs-rounds curve behind AutoDistributedIters)
      case "auto" => "auto" -> IvfBuilder.Config("embedding")
      case "sample_only" => "sample_only" -> IvfBuilder.Config("embedding", distributedIters = 0)
      case a if a.startsWith("d") =>
        a -> IvfBuilder.Config(
          "embedding", maxIters = IvfBuilder.AutoSampleIters,
          distributedIters = a.drop(1).toInt)
      case a => throw new IllegalArgumentException(s"unknown arm $a")
    }.foreach { case (name, config) =>
      val storeDir = java.nio.file.Files
        .createTempDirectory(s"graft-buildprobe-$name").toString
      val t0 = System.nanoTime()
      val built = IvfBuilder.build(spark, corpus, config, new IndexStore(storeDir))
      val sec = (System.nanoTime() - t0) / 1e9
      val sse = fullSse(built.centroids)
      System.err.println(
        f"[build-probe] $name: ${sec}%.1f s, k=${built.nClusters}, sse=$sse%.3e")
      out += f""""$name":{"build_sec":$sec%.1f,"n_clusters":${built.nClusters},"sse":$sse%.4e}"""
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(storeDir))
    }
    println(s"""{"metric":"build_scale_probe","rows":$rows,"dim":$dim,"arms":{${out.result().mkString(",")}}}""")
    spark.stop()
  }
}
