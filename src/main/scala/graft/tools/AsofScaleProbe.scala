package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[graft.ops.AsOf.asofJoin]] — the claim under test is
  * the docstring's cost model: ONE shuffle by key (union + keyed window),
  * no range-join pair explosion, so 5M probe rows against 5M quote rows
  * run in seconds where the naive as-of (join every left row to all
  * earlier right rows, then argmax) explodes by the per-key pairing. A
  * 50-key slice is verified against the exact window-on-join form, both
  * directions.
  *
  * NOT part of the per-round bench; run manually and record in
  * BENCHNOTES.md: `sbt "runMain graft.tools.AsofScaleProbe"`
  * (env: SPARK_GRAFT_ASOFSCALE_ROWS default 5M, _KEYS default 100k).
  */
object AsofScaleProbe {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_ASOFSCALE_ROWS", "5000000").toLong
    val keys = sys.env.getOrElse("SPARK_GRAFT_ASOFSCALE_KEYS", "100000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val left = spark.range(rows).select(
      pmod(xxhash64(col("id"), lit(1)), lit(keys)).as("k"),
      pmod(xxhash64(col("id"), lit(2)), lit(1000000000L)).as("ts"),
      col("id").as("lid")).localCheckpoint()
    val right = spark.range(rows).select(
      pmod(xxhash64(col("id"), lit(3)), lit(keys)).as("k"),
      pmod(xxhash64(col("id"), lit(4)), lit(1000000000L)).as("ts"),
      col("id").as("payload")).localCheckpoint()

    for (dir <- Seq("backward", "forward")) {
      var n = 0L
      var matched = 0L
      val t = graft.BenchTiming.timeMin("asofscale") {
        val out = graft.ops.AsOf.asofJoin(left, right, Seq("k"), "ts", dir)
        val agg = out.agg(count(lit(1)), count(col("asof_payload"))).head()
        n = agg.getLong(0); matched = agg.getLong(1)
      }
      println(f"[asofscale] $dir%-8s rows=$n matched=$matched  $t%.2f s")
      require(n == rows, s"as-of must preserve every left row, got $n of $rows")
    }

    // exact check on a 50-key slice: window over the as-of-eligible join
    val lS = left.where(col("k") < 50)
    val rS = right.where(col("k") < 50)
    val exact = lS.as("l")
      .join(rS.as("r"), col("l.k") === col("r.k") && col("r.ts") <= col("l.ts"), "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("l.k"), col("lid"))
          .orderBy(col("r.ts").desc_nulls_last, col("r.payload").desc_nulls_last)))
      .where(col("rn") === 1)
      .select(col("lid"), col("r.payload").as("exp_payload"))
    val got = graft.ops.AsOf.asofJoin(lS, rS, Seq("k"), "ts")
      .select(col("lid"), col("asof_payload"))
    val cmp = got.join(exact, "lid")
      .where(not(col("asof_payload") <=> col("exp_payload")))
      .count()
    // right (k, ts) may collide (hash ties): the operator documents
    // nondeterminism there, so only compare rows whose match is unique
    val dupTs = rS.groupBy("k", "ts").count().where(col("count") > 1).count()
    println(s"[asofscale] 50-key slice: $cmp mismatches ($dupTs duplicate (k,ts) right rows)")
    require(cmp <= dupTs, s"slice mismatch beyond duplicate-ts tolerance: $cmp > $dupTs")
    println("[asofscale] slice parity OK")
    spark.stop()
  }
}
