package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for named registry queries into
  * `plans/<tag>/<query>_<suffix>.txt` — the before/after plan evidence an
  * optimization round commits next to its writeup.
  * Usage: `sbt "runMain graft.tools.PlanDump r14 before cq7_crawl_discovery ..."`
  * Env: SPARK_GRAFT_SF_DIR (default sf0.001). Plans over `MaxBytes` are
  * truncated with a marker line (a pathological expression tree IS the
  * evidence; megabytes of it are not).
  */
object PlanDump {
  private val MaxBytes = 400 * 1024

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <roundTag> <suffix> <query>...")
    val (tag, suffix, names) = (args(0), args(1), args.drop(2).toSeq)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.install(spark)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val dir = java.nio.file.Paths.get("plans", tag)
    java.nio.file.Files.createDirectories(dir): Unit
    val graftConf0 = spark.conf.getAll.filter(_._1.startsWith("spark.graft."))
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sf)
        // run first so AQE-final shapes (join strategy, coalesced reads)
        // are what the formatted text describes
        df.queryExecution.toRdd.count(): Unit
        val full =
          s"-- $name ($suffix, sf=$sf)\n" +
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
        val text =
          if (full.length <= MaxBytes) full
          else full.take(MaxBytes) +
            s"\n... [TRUNCATED: full plan text was ${full.length} bytes]\n"
        java.nio.file.Files.write(
          dir.resolve(s"${name}_$suffix.txt"), text.getBytes("UTF-8")): Unit
        println(s"[plandump] wrote ${dir.resolve(s"${name}_$suffix.txt")} " +
          s"(${text.length} bytes)")
      } catch { case e: Throwable => println(s"[plandump] $name ERROR: $e") }
      finally {
        spark.conf.getAll.keys.filter(_.startsWith("spark.graft."))
          .foreach(spark.conf.unset)
        graftConf0.foreach { case (k, v) => spark.conf.set(k, v) }
      }
    }
    spark.stop()
  }
}
