package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[graft.ops.Corpus.topFraction]] /
  * [[graft.ops.Corpus.quantileBuckets]] — the exact-global-rank machinery
  * (range-partition the rank keys, count partitions, extract the k-th key
  * from ONE partition, filter). Claim under test: exact ntile/top-k-cut
  * WITHOUT a global sort or a single-partition window — at 20M rows the
  * window form funnels everything through one task; the rank machinery
  * must stay parallel and EQUAL it row-for-row (checked at 200k where the
  * window form is still cheap, plus membership-count checks at 20M).
  *
  * NOT part of the per-round bench; run manually and record in
  * BENCHNOTES.md: `sbt "runMain graft.tools.RankScaleProbe"`
  * (env: SPARK_GRAFT_RANKSCALE_ROWS default 20M).
  */
object RankScaleProbe {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_RANKSCALE_ROWS", "20000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.expressions.Window

    def table(n: Long) = spark.range(n).select(
      col("id"),
      // heavy ties (1k distinct scores) — the regime where exact rank cuts
      // must tie-break deterministically
      pmod(xxhash64(col("id"), lit(5)), lit(1000L)).cast("double").as("score"))
      .localCheckpoint()

    val big = table(rows)
    var kept = 0L
    val tTop = graft.BenchTiming.timeMin("rankscale") {
      kept = graft.ops.Corpus.topFraction(big, col("score"), col("id"), 0.25).count()
    }
    val expectK = math.ceil(rows * 0.25).toLong
    println(f"[rankscale] topFraction(0.25) @ $rows rows: kept=$kept  $tTop%.2f s")
    require(kept == expectK, s"exact-k violated: $kept != $expectK")

    var nb = 0L
    val tBuck = graft.BenchTiming.timeMin("rankscale") {
      nb = graft.ops.Corpus.quantileBuckets(big, col("score"), col("id"), 8)
        .groupBy(col("bucket")).count().count()
    }
    println(f"[rankscale] quantileBuckets(8) @ $rows rows: buckets=$nb  $tBuck%.2f s")
    require(nb == 8L, s"expected 8 buckets, got $nb")

    // row-for-row equality vs the window form at 200k (window is one task)
    val small = table(200000L)
    val viaRank = graft.ops.Corpus.quantileBuckets(small, col("score"), col("id"), 8)
      .select(col("id"), col("bucket"))
    val viaWindow = small.select(
      col("id"),
      ntile(8).over(Window.orderBy(col("score"), col("id"))).as("wbucket"))
    val diff = viaRank.join(viaWindow, "id")
      .where(col("bucket") =!= col("wbucket")).count()
    require(diff == 0L, s"$diff rows disagree with ntile")
    println("[rankscale] 200k row-for-row ntile parity OK")
    spark.stop()
  }
}
