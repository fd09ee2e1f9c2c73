package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Honest probe for [[graft.ops.Skew.saltedJoin]]'s niche: a 20M-row big
  * side where ONE key holds half the rows, shuffle-joined to a 100k-row
  * small side pinned ABOVE the broadcast threshold (the "too large to
  * broadcast, one celebrity key" shape). Three arms, row-count parity
  * asserted:
  *   1. plain join, AQE skew-split ON (Spark's own mitigation),
  *   2. plain join, AQE skew-split OFF (the engine-without-AQE null),
  *   3. saltedJoin(salts=32), AQE ON.
  * The module scaladoc already frames salting as the FALLBACK when AQE's
  * split doesn't apply — this probe measures whether that framing is
  * right at this shape, whatever the answer is.
  *
  * NOT part of the per-round bench; run manually and record in
  * BENCHNOTES.md: `sbt "runMain graft.tools.SkewScaleProbe"`.
  */
object SkewScaleProbe {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_SKEWSCALE_ROWS", "20000000").toLong
    val keys = 100000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // the niche: no broadcast
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // half the rows on key 0, half uniform over the key space; a payload
    // column differentiates rows so the content salt can spread them
    val big = spark.range(rows).select(
      when(col("id") % 2 === 0, lit(0L))
        .otherwise(pmod(xxhash64(col("id"), lit(7)), lit(keys))).as("k"),
      md5(col("id").cast("string")).as("payload")).localCheckpoint()
    val small = spark.range(keys).select(
      col("id").as("sk"), xxhash64(col("id"), lit(9)).as("attr")).localCheckpoint()

    def arm(name: String, skewSplit: Boolean)(f: => Long): Unit = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewSplit.toString)
      var n = 0L
      val t = graft.BenchTiming.timeMin("skewscale") { n = f }
      println(f"[skewscale] $name%-22s rows=$n  $t%.2f s")
      require(n == rows, s"$name: expected $rows output rows, got $n")
    }
    arm("plain-aqe-skew-on", skewSplit = true)(
      big.join(small, col("k") === col("sk")).count())
    arm("plain-aqe-skew-off", skewSplit = false)(
      big.join(small, col("k") === col("sk")).count())
    arm("salted-32", skewSplit = true)(
      graft.ops.Skew.saltedJoin(big, small, "k", "sk", salts = 32).count())
    spark.stop()
  }
}
