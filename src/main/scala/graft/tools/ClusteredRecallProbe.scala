package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale sweep for the bench's `recall_at100_clustered` operating point:
  * the metric must sit in a band where it can MOVE — a well-separated
  * mixture reads 1.0 no matter what the probe code does (the r13 first
  * cut's mistake: centers at 8σ in 32-d are ~64 apart vs unit noise, so
  * every neighbor lives in one cell), while heavy overlap collapses to
  * the uniform fixture's 0.48. Run:
  * `sbt "runMain graft.tools.ClusteredRecallProbe"`.
  */
object ClusteredRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val scales = if (args.nonEmpty) args.map(_.toDouble).toSeq
      else Seq(0.8, 1.2, 1.6, 2.0, 3.0)
    println("== ClusteredRecallProbe ==")
    scales.foreach { s =>
      val r = graft.Bench.clusteredRecallMetric(spark, s)
      println(f"centerScale=$s%.1f recall@100(nprobe16)=$r%.3f")
    }
    spark.stop()
  }
}
