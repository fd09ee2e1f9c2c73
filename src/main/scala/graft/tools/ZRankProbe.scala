package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the z-order bucket-rank expression (review r11): the
  * codegen'd [[graft.functions.sorted_rank]] binary-search kernel vs the
  * original HOF `size(filter(typedLit(bounds), b => b <= v))`, evaluated
  * exactly as [[graft.ops.Layout.writeZOrder]] does — per row per layout
  * column at 2^bits − 1 = 255 boundaries — isolated from the write path
  * (count over a sum of ranks; no IO, no shuffle, pure projection cost).
  *
  * NOT part of the per-round bench; run manually and record in
  * BENCHNOTES.md: `sbt "runMain graft.tools.ZRankProbe"`
  * (env: SPARK_GRAFT_ZRANK_ROWS, default 5M).
  */
object ZRankProbe {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_ZRANK_ROWS", "5000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bounds = Array.tabulate(255)(i => i * 39.0) // 2^8-bit equi-depth shape
    val df = spark.range(rows).select(
      (pmod(xxhash64(col("id"), lit(1)), lit(1000000L)).cast("double") / 100.0).as("a"),
      (pmod(xxhash64(col("id"), lit(2)), lit(1000000L)).cast("double") / 100.0).as("b"))

    val kernelExpr =
      graft.functions.sorted_rank(col("a"), bounds).cast("long") +
        graft.functions.sorted_rank(col("b"), bounds).cast("long")
    val hofExpr =
      size(filter(typedLit(bounds.toSeq), x => x <= col("a"))).cast("long") +
        size(filter(typedLit(bounds.toSeq), x => x <= col("b"))).cast("long")

    def run(name: String, e: org.apache.spark.sql.Column): Double = {
      df.select(sum(e)).head() // warm codegen + JIT
      val t = graft.BenchTiming.timeMin("zrank") {
        df.select(sum(e)).head(): Unit
      }
      println(f"[zrank] $name%-8s $t%.3f s  ($rows rows x 2 cols, 255 bounds)")
      t
    }
    val sk = df.select(sum(kernelExpr)).head().getLong(0)
    val sh = df.select(sum(hofExpr)).head().getLong(0)
    require(sk == sh, s"rank sums differ: kernel $sk vs hof $sh")
    println(s"[zrank] rank-sum parity OK ($sk)")
    val tk = run("kernel", kernelExpr)
    val th = run("hof", hofExpr)
    println(f"[zrank] speedup ${th / tk}%.2fx")
    spark.stop()
  }
}
