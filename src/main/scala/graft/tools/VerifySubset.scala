package graft.tools

import org.apache.spark.sql.SparkSession

/** Builder-side helper: run a SUBSET of SparkEntry.queries (names in args
  * after sfDir/outDir) and dump each result + its oracle SQL, for a quick
  * local DuckDB compare while iterating on a new query — the per-entry
  * loop matches Verify (including the spark.graft.* conf restore) without
  * paying the full 100+-entry suite.
  */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val graftConf0 = spark.conf.getAll.filter(_._1.startsWith("spark.graft."))
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(
        name, sys.error(s"unknown query: $name"))
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      finally {
        spark.conf.getAll.keys.filter(_.startsWith("spark.graft."))
          .foreach(spark.conf.unset)
        graftConf0.foreach { case (k, v) => spark.conf.set(k, v) }
      }
      graft.SparkEntry.oracleSql.get(name).foreach { sql =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/$name.sql"), sql)
      }
      println(s"[verify-subset] wrote $name")
    }
    // the oracle_sql.json manifest check_oracle.py consumes — so the
    // subset dir is directly checkable by the same gate script as a full
    // Verify run (r14: was hand-assembled every time)
    val manifest = names
      .flatMap(n => graft.SparkEntry.oracleSql.get(n).map(n -> _))
      .map { case (n, sql) =>
        val esc = sql.replace("\\", "\\\\").replace("\"", "\\\"")
          .replace("\n", "\\n").replace("\t", "\\t")
        s""""$n":"$esc""""
      }
      .mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), manifest): Unit
    spark.stop()
  }
}
