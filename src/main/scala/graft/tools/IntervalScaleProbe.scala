package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[graft.ops.Intervals.overlapJoin]] — the claim under
  * test is the docstring's cost model: work ∝ bins-per-interval + true
  * candidate pairs, never |A|×|B|. At 5M×5M a theta join is 2.5e13 pairs
  * (impossible); the bin join must finish in seconds and its output must
  * be WIDTH-INVARIANT (any binWidth yields the same pairs — only the
  * plan's fan-out moves), which doubles as the at-scale correctness
  * check. A 2k×2k slice is additionally verified against the exact
  * cartesian predicate.
  *
  * Shape: starts uniform in [0, 1e9]; spans 1 + h%1000 with a 0.1% tail
  * of ~100k-long spans — the long tail exercises the auto-width clamp
  * (p99 width alone would trip the explosion guard).
  *
  * NOT part of the per-round bench; run manually and record in
  * BENCHNOTES.md: `sbt "runMain graft.tools.IntervalScaleProbe"`
  * (env: SPARK_GRAFT_INTERVALSCALE_ROWS default 5M).
  */
object IntervalScaleProbe {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_INTERVALSCALE_ROWS", "5000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def side(seed: Int, idCol: String, sCol: String, eCol: String) = {
      val h1 = xxhash64(col("id"), lit(seed))
      val h2 = xxhash64(col("id"), lit(seed + 1))
      val start = pmod(h1, lit(1000000000L))
      // 0.1% long tail: ~100k spans; body: 1 + h%1000
      val span = when(pmod(h2, lit(1000L)) === 0L,
        lit(1L) + pmod(h2, lit(100000L)) * 2L)
        .otherwise(lit(1L) + pmod(h2, lit(1000L)))
      spark.range(rows).select(
        col("id").as(idCol), start.as(sCol), (start + span).as(eCol))
    }
    val a = side(11, "a_id", "a_s", "a_e").localCheckpoint()
    val b = side(29, "b_id", "b_s", "b_e").localCheckpoint()

    val auto = graft.ops.Intervals.autoBinWidth(
      a, col("a_s"), col("a_e"), b, col("b_s"), col("b_e"))
    println(s"[intervalscale] rows=$rows autoBinWidth=$auto")

    def run(name: String, width: Long): Long = {
      var n = 0L
      val t = graft.BenchTiming.timeMin("intervalscale") {
        n = graft.ops.Intervals.overlapJoin(
          a, col("a_s"), col("a_e"), b, col("b_s"), col("b_e"), binWidth = width).count()
      }
      println(f"[intervalscale] $name%-12s width=$width%-8d pairs=$n  $t%.2f s")
      n
    }
    val nAuto = run("auto", auto)
    val nHalf = run("half-width", math.max(1L, auto / 2))
    val nDouble = run("double-width", auto * 2)
    require(nAuto == nHalf && nAuto == nDouble,
      s"width-invariance violated: $nAuto / $nHalf / $nDouble")
    println(s"[intervalscale] width-invariance OK ($nAuto pairs at 3 widths)")

    // exact cartesian check on a 2k slice of each side
    val aS = a.where(col("a_id") < 2000)
    val bS = b.where(col("b_id") < 2000)
    val exact = aS.crossJoin(bS)
      .where(col("a_s") <= col("b_e") && col("b_s") <= col("a_e")).count()
    val got = graft.ops.Intervals.overlapJoin(
      aS, col("a_s"), col("a_e"), bS, col("b_s"), col("b_e")).count()
    require(exact == got, s"slice mismatch: exact $exact vs binned $got")
    println(s"[intervalscale] 2k-slice exact parity OK ($exact pairs)")
    spark.stop()
  }
}
