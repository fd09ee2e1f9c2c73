package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ad-hoc profiling entry: times one named query from the registry at a
  * given sf dir and prints the formatted plan. Not part of the engine.
  * Usage: runMain graft.tools.Profile <queryName> [sfDir] [repeat]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty || !graft.SparkEntry.queries.contains(args(0))) {
      System.err.println(
        "usage: runMain graft.tools.Profile <queryName> [sfDir] [repeat]\n" +
          "queries: " + graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(1)
    }
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val repeat = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.install(spark)
    def materialize(df: DataFrame): Long = df.queryExecution.toRdd.count()
    (1 to repeat).foreach { i =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val n = materialize(df)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"RUN$i $name: $sec%.3f s ($n rows)")
      if (i == repeat) println(df.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
