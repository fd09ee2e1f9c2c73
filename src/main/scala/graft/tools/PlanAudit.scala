package graft.tools

import org.apache.spark.sql.SparkSession

/** One-screen physical-plan audit of registry queries: exchange /
  * broadcast / sort-merge-join / codegen-span counts per entry, plus the
  * full plan on request — the `.explain` iteration loop the build brief
  * asks for, as a tool instead of ad-hoc console sessions.
  * `sbt "runMain graft.tools.PlanAudit q1_agg uq3_psl_domains"`;
  * `SPARK_GRAFT_PLAN_FULL=1` prints whole plans. Queries execute first so
  * AQE shows final shapes; the executed toString then contains BOTH the
  * final and the "Initial Plan" sections, so counts read ~2x the real
  * number — compare entries against each other, or read the full plan.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.install(spark)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    // conf hygiene (same as Verify/Bench): entries set spark.graft.* keys
    // (tier/nprobe/oversample) at plan-construction time — without a reset
    // a leaked tier conf silently plans every LATER entry wrong
    val graftConf0 = spark.conf.getAll.filter(_._1.startsWith("spark.graft."))
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sf)
        // execute first: AQE plans only show final shapes (and codegen
        // markers) after the run — sf0.001 keeps this cheap
        df.queryExecution.toRdd.count(): Unit
        val p = df.queryExecution.executedPlan.toString
        def n(pat: String) = pat.r.findAllIn(p).length
        println(s"== $name exchanges=${n("Exchange hashpartitioning")} " +
          s"bhj=${n("BroadcastHashJoin")} smj=${n("SortMergeJoin")} " +
          s"wscg=${n("\\*\\([0-9]+\\)")} scans=${n("FileScan|BatchScan")}")
        if (sys.env.contains("SPARK_GRAFT_PLAN_FULL")) println(p)
      } catch { case e: Throwable => println(s"== $name ERROR: $e") }
      finally {
        spark.conf.getAll.keys.filter(_.startsWith("spark.graft."))
          .foreach(spark.conf.unset)
        graftConf0.foreach { case (k, v) => spark.conf.set(k, v) }
      }
    }
    spark.stop()
  }
}
