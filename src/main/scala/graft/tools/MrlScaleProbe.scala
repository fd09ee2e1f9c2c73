package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Matryoshka scale probe: at 500k × 256 (the ScaleBench clustered-blob
  * corpus shape), what do the prefix-dim coarse phase and a STORED prefix
  * column actually buy over brute force — and what recall does the
  * benched operating point hold? Times brute full-dim top-100, mrlTopK
  * with the slice computed on the fly (saves nothing on IO — reads the
  * full vector column — isolates the compute effect), and mrlTopK over a
  * table carrying the 64-dim prefix as its own column (the 100 TB
  * layout: the coarse pass reads 1/4 of the float bytes). Reports
  * top-100 recall of both MRL forms vs brute.
  *
  * NOT part of the per-round bench; run manually, record in BENCHNOTES:
  * `sbt "runMain graft.tools.MrlScaleProbe"` (env: SPARK_GRAFT_SCALE_ROWS,
  * _DIM, SPARK_GRAFT_MRL_PREFIX, _OS to override).
  */
object MrlScaleProbe {
  private def timeMin(f: => Unit): Double = graft.BenchTiming.timeMin("mrlscale")(f)

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "500000").toLong
    val dim = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIM", "256").toInt
    val prefixDim = sys.env.getOrElse("SPARK_GRAFT_MRL_PREFIX", "64").toInt
    val oversample = sys.env.getOrElse("SPARK_GRAFT_MRL_OS", "4").toInt
    val trueClusters = 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val baseDir = "/root/repo/.graft/scale"
    val dir = s"$baseDir/mrl_${rows}x$dim"

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ScaleBench's blob corpus (same seeds), plus the stored prefix
    // column. Two energy profiles: "iso" keeps every dimension at equal
    // scale (an embedding NOT trained for matryoshka — the control, where
    // a prefix must rank weakly), "decay" scales element j of centers,
    // noise, and query by 1/sqrt(1 + j/16) — the leading-dims-carry-the-
    // energy profile matryoshka training produces, which is the operator's
    // documented contract.
    val centers = {
      val r = new java.util.Random(2026L)
      Array.fill(trueClusters * dim)(r.nextFloat() * 10f)
    }
    def scaleOf(profile: String, j: Int): Float =
      if (profile == "decay") (1.0 / math.sqrt(1.0 + j / 16.0)).toFloat else 1.0f
    def corpusDir(profile: String) = s"${dir}_$profile"
    Seq("iso", "decay").foreach { profile =>
      if (!new java.io.File(corpusDir(profile)).exists()) {
        val bc = spark.sparkContext.broadcast(centers)
        val d = dim; val c = trueClusters; val p = prefixDim
        spark.range(rows).as[Long]
          .mapPartitions { it =>
            val cents = bc.value
            it.map { id =>
              val rng = new java.util.Random(id * 0x9E3779B97F4A7C15L + 42L)
              val cluster = (id % c).toInt
              val vec = Array.tabulate(d) { j =>
                (cents(cluster * d + j) + (rng.nextGaussian() * 0.5).toFloat) *
                  scaleOf(profile, j)
              }
              (id, vec, vec.take(p))
            }
          }
          .toDF("vec_id", "embedding", "prefix")
          .repartition(16)
          .write.mode("overwrite").parquet(corpusDir(profile))
      }
    }

    def queryFor(profile: String): Seq[Float] = {
      val jitter = new java.util.Random(777L)
      Seq.tabulate(dim)(j =>
        (centers(7 * dim + j) + (jitter.nextGaussian() * 0.25).toFloat) *
          scaleOf(profile, j))
    }
    val k = 100
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSet

    val sections = Seq("iso", "decay").flatMap { profile =>
      def table() = spark.read.parquet(corpusDir(profile))
      val query = queryFor(profile)
      def brute() = graft.ivf.VectorTopK.bruteForce(
        table().select("vec_id", "embedding"), "embedding", query, k)
      def mrlInline() = graft.ops.Similarity.mrlTopK(
        table().select("vec_id", "embedding"), "vec_id", "embedding", query, k,
        prefixDim, oversample)
      def mrlStored() = graft.ops.Similarity.mrlTopK(
        table(), "vec_id", "embedding", query, k,
        prefixDim, oversample, prefixCol = Some("prefix"))
      // warm
      ids(brute()); ids(mrlInline()); ids(mrlStored()): Unit
      val tBrute = timeMin(ids(brute()): Unit)
      val tInline = timeMin(ids(mrlInline()): Unit)
      val tStored = timeMin(ids(mrlStored()): Unit)
      val exact = ids(brute())
      val rInline = (ids(mrlInline()) intersect exact).size.toDouble / exact.size
      val rStored = (ids(mrlStored()) intersect exact).size.toDouble / exact.size
      Seq(
        s"${profile}_brute_sec" -> tBrute,
        s"${profile}_mrl_inline_sec" -> tInline,
        s"${profile}_mrl_stored_sec" -> tStored,
        s"${profile}_mrl_inline_recall" -> rInline,
        s"${profile}_mrl_stored_recall" -> rStored)
    }
    val js = sections.map { case (kk, v) => "\"" + kk + "\":" + v }.mkString("{", ",", "}")
    println(
      s"""{"metric":"mrl_scale_probe","rows":$rows,"dim":$dim,"prefix":$prefixDim,"oversample":$oversample,"sections":$js}""")
    spark.stop()
  }
}
