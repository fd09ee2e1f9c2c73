package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe for the sq2/va1 CORRECTNESS-gate floors (round 10): at
  * each SF, print the RAW quality numbers behind the gated records —
  * va1's ANN∩exact hit count at nprobe=4, and the cell-pair recall vs the
  * exact cosine pair join at probes 1 and 4 — so the committed floors are
  * measured bands with margin, not guesses.
  *
  * Usage: `sbt "runMain graft.tools.GateProbe /root/testdata/sf0.001 ..."`
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    dirs.foreach { sfDir =>
      val path = s"$sfDir/embeddings.parquet"
      val (ti, centroids) =
        graft.ivf.IndexManager.ensureWithCentroids(spark, path, "embedding")
      val emb = spark.read.parquet(path)
      val n = emb.count()

      // va1: indexed top-10 at nprobe=4 vs brute top-10
      val k = 10
      val annIds = graft.ivf.VectorTopK
        .indexed(spark, path, "embedding", graft.Queries.queryVec, k,
          graft.ivf.VectorTopK.Options(nprobe = 4))
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
      val exactIds = graft.ivf.VectorTopK
        .bruteForce(emb, "embedding", graft.Queries.queryVec, k)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
      val hits = (annIds intersect exactIds).size

      // sq2: cell pairs at threshold 0.3, probes 1 and 4, vs exact
      val exactPairs = graft.ops.Dedup
        .embeddingNearDupPairs(emb, "vec_id", "embedding", 0.3).count()
      def cellRecall(probes: Int): (Long, Double) = {
        val c = graft.ops.Similarity
          .ivfCellPairs(emb, "vec_id", "embedding", centroids, ti.dim, 0.3,
            probes = probes)
          .count()
        (c, if (exactPairs == 0L) -1.0 else c.toDouble / exactPairs)
      }
      val (c1, r1) = cellRecall(1)
      val (c4, r4) = cellRecall(4)
      println(
        f"[gate] $sfDir rows=$n nClusters=${ti.nClusters} " +
          f"va1_hits=$hits/$k exact_pairs=$exactPairs " +
          f"cell_pairs_p1=$c1 recall_p1=$r1%.3f cell_pairs_p4=$c4 recall_p4=$r4%.3f")
    }
    spark.stop()
  }
}
