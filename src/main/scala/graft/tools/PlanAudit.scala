package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of named `SparkEntry.queries` entries
  * — the scale-grading audit loop (`PushedFilters`, `WholeStageCodegen`
  * spans, exchange counts) without hand-writing a probe per query.
  *
  * Usage: `SPARK_GRAFT_ONLY=dx2_bloom_novel sbt "runMain graft.tools.PlanAudit"`
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
  * Streaming-sink entries (st*) materialize through replay and cannot
  * explain statically — audit their batch twin instead.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val only = sys.env.getOrElse("SPARK_GRAFT_ONLY", "")
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq
    require(only.nonEmpty, "set SPARK_GRAFT_ONLY=name1,name2")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.install(spark)
    // same per-entry conf hygiene as Verify/VerifySubset: an entry that
    // pins spark.graft.* keys at plan-construction time must not leak them
    // into the next entry's audited plan
    val graftConf0 = spark.conf.getAll.filter(_._1.startsWith("spark.graft."))
    only.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(
        name, sys.error(s"unknown query: $name"))
      println(s"========== $name ==========")
      try fn(spark, sfDir).explain("formatted")
      finally {
        spark.conf.getAll.keys.filter(_.startsWith("spark.graft."))
          .foreach(spark.conf.unset)
        graftConf0.foreach { case (k, v) => spark.conf.set(k, v) }
      }
    }
    spark.stop()
  }
}
