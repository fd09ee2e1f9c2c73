package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ivf.{IndexManager, IndexStore}
import graft.ops.Similarity

/** MaxSim/ColBERT operating-point probe (round-7 verdict item 3): the
  * per-round bench pins `maxsim_recall_probe4` on the sf0.1 fixture, where
  * UNIFORM random vectors make every pairwise distance concentrate — cell
  * ranking carries no signal there, so a low number could be the fixture
  * or the PLAID shape. This separates the two: run the same top-20-group
  * recall sweep over per-token probe counts on BOTH layouts of the 500k
  * Gaussian-mixture corpus ([[ScaleBench]]'s generator), where a jittered
  * near-center query has a REAL neighborhood (single-vector recall is 1.0
  * there, BENCHNOTES round-6/7). If recall tracks the probe curve to ~1 on
  * the mixture, the sf0.1 number is fixture-bound and the shape is sound;
  * if it stays low even clustered, the union-of-probes candidate rule
  * itself loses the true groups.
  *
  * Run manually, record in BENCHNOTES.md:
  *   `sbt "runMain graft.tools.MaxsimProbe"`
  * (env: SPARK_GRAFT_SCALE_DIR to override the corpus root; the 500k
  * corpus must exist — run ScaleBench once first). Prints one JSON line.
  */
object MaxsimProbe {

  def main(args: Array[String]): Unit = {
    val rows = 500000L
    val dim = 256
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/root/repo/.graft/scale")
    val corpus = s"$baseDir/corpus_${rows}x$dim"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    require(
      new java.io.File(corpus).exists(),
      s"$corpus missing — run graft.tools.ScaleBench once to generate it")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val store = new IndexStore(s"$baseDir/index")
    // 4 query tokens near 4 distinct blob centers — the multi-aspect query
    // late interaction exists for (each token has its own true
    // neighborhood); same jitter protocol as ScaleBench's single query
    val centers = {
      val r = new java.util.Random(2026L)
      Array.fill(64 * dim)(r.nextFloat() * 10f)
    }
    val queries: Seq[Seq[Float]] = Seq(7, 13, 21, 42).map { c =>
      val jitter = new java.util.Random(1000L + c)
      Seq.tabulate(dim)(j => centers(c * dim + j) + (jitter.nextGaussian() * 0.25).toFloat)
    }
    val k = 20

    def layoutSweep(table: String, prefix: String): Seq[String] = {
      val (ti, centroids) = IndexManager.ensureWithCentroids(spark, table, "embedding", store)
      val grouped = spark.read.parquet(table)
        .withColumn("group_id", (col("vec_id") / lit(10)).cast("bigint"))
      def top(df: DataFrame): Set[Long] =
        df.select("group_id").collect().map(_.getLong(0)).toSet
      val t0 = System.nanoTime()
      val exact = top(Similarity.colbertTopK(grouped, "group_id", "embedding", queries, k))
      val exactSec = (System.nanoTime() - t0) / 1e9
      val sweep = Seq(1, 2, 4, 8, 16).map { probes =>
        val t1 = System.nanoTime()
        val approx = top(Similarity.colbertTopKIvf(
          grouped, "group_id", "embedding", queries, k, centroids, ti.dim, probes))
        val sec = (System.nanoTime() - t1) / 1e9
        val recall = (approx intersect exact).size.toDouble / exact.size
        f"""\"${prefix}recall_probe$probes\":$recall%.3f,\"${prefix}sec_probe$probes\":$sec%.2f"""
      }
      (f"""\"${prefix}exact_sec\":$exactSec%.2f,\"${prefix}n_clusters\":${ti.nClusters}""" +: sweep)
    }

    val clustered = s"${corpus}_bycell"
    val fields =
      layoutSweep(corpus, "") ++
        (if (new java.io.File(clustered).exists()) layoutSweep(clustered, "clustered_")
         else Seq("\"clustered_skipped\":true"))
    println(s"""{"metric":"maxsim_probe","rows":$rows,"dim":$dim,"k":$k,"tokens":${queries.size},${fields.mkString(",")}}""")
    spark.stop()
  }
}
