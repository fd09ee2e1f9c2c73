package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Layout scale probe: does [[graft.ops.Layout.writeZOrder]] actually beat
  * the single-column sorted layout on multi-dimensional selective scans at
  * a size where row-group pruning matters? The per-round fixture's events
  * table is small enough that every layout is one row group — the layout
  * claims are only provable at scale. Generates a seeded N-row (default
  * 5M) events-like table with two INDEPENDENT uniform selective dims
  * (user_id, value) plus a payload column, writes it three ways —
  * round-robin (ingest order), sorted by user_id, z-ordered on
  * (user_id, value) — and for each layout times three scans (user-range,
  * value-range, 2-D box, each ~1% selective per dim) and reports the
  * rows the scan leaves emit (row-group pruning evidence, the same
  * numOutputRows metric LayoutSpec asserts on).
  *
  * NOT part of the per-round bench (minutes-long); run manually and record
  * in BENCHNOTES.md: `sbt "runMain graft.tools.LayoutScaleProbe"`
  * (env: SPARK_GRAFT_LAYOUTSCALE_ROWS, _DIR to override).
  */
object LayoutScaleProbe {
  private def timeMin(f: => Unit): Double = graft.BenchTiming.timeMin("layoutscale")(f)

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_LAYOUTSCALE_ROWS", "5000000").toLong
    val dir = sys.env.getOrElse(
      "SPARK_GRAFT_LAYOUTSCALE_DIR",
      java.nio.file.Files.createTempDirectory("graft-layoutscale").toString)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 4 MB row groups: at 5M rows × ~50 B that is ~4 row groups per 32-way
    // file — enough zone-map granularity for pruning to show; the default
    // 128 MB block would leave one row group per file (file-level pruning
    // only, understating the layout difference a real multi-TB table sees)
    spark.sparkContext.hadoopConfiguration.setInt("parquet.block.size", 4 << 20)
    val users = 100000L
    // independent uniform dims derived from the id (no RNG state per task)
    val df = spark.range(rows).select(
      col("id"),
      pmod(xxhash64(col("id"), lit(1)), lit(users)).as("user_id"),
      (pmod(xxhash64(col("id"), lit(2)), lit(1000000L)).cast("double") / 1e4)
        .as("value"),
      md5(col("id").cast("string")).as("payload"))

    val layouts: Seq[(String, String)] = Seq(
      "plain" -> s"$dir/plain", "sorted" -> s"$dir/sorted", "zorder" -> s"$dir/zorder")
    df.repartition(32).write.mode("overwrite").parquet(s"$dir/plain")
    graft.ops.Layout.writeSortedBy(
      spark.read.parquet(s"$dir/plain"), s"$dir/sorted", Seq("user_id"), 32): Unit
    val tZ = timeMin {
      graft.ops.Layout.writeZOrder(
        spark.read.parquet(s"$dir/plain"), s"$dir/zorder",
        Seq("user_id", "value"), numFiles = 32): Unit
    }

    // ~1%-per-dim predicates
    val userLo = 1000L; val userHi = 2000L
    val valLo = 10.0; val valHi = 11.0
    def scans(path: String): Seq[(String, () => DataFrame)] = {
      def t() = spark.read.parquet(path)
      Seq(
        "user_range" -> (() =>
          t().where(col("user_id") >= userLo && col("user_id") < userHi)),
        "value_range" -> (() => t().where(col("value") >= valLo && col("value") < valHi)),
        "box" -> (() => t().where(
          col("user_id") >= userLo && col("user_id") < userHi &&
            col("value") >= valLo && col("value") < valHi)))
    }

    val out = layouts.flatMap { case (name, path) =>
      scans(path).flatMap { case (scan, mk) =>
        // timing (min-of-reps) and leaf-emitted rows (pruning evidence);
        // the metric must come from the EXECUTED plan, so collect the
        // narrow projection itself rather than a derived count plan
        val sec = timeMin { mk().agg(count(lit(1))).collect(): Unit }
        val q = mk().select(col("user_id"))
        val n = q.collect().length
        val scanned = q.queryExecution.executedPlan.collectLeaves()
          .map(_.metrics("numOutputRows").value).sum
        Seq(
          s"${name}_${scan}_sec" -> sec,
          s"${name}_${scan}_scanned_rows" -> scanned.toDouble,
          s"${name}_${scan}_result_rows" -> n.toDouble)
      }
    } :+ ("zorder_write_sec" -> tZ)

    val js = out.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"layout_scale_probe","rows":$rows,"queries":$js}""")
    spark.stop()
  }
}
