package graft.tools

import org.apache.spark.sql.SparkSession

/** Solo re-prove harness: time a named subset of `SparkEntry.queries`
  * with the exact Bench methodology (warmup, then min-of-Reps via
  * [[graft.BenchTiming]]) without paying for the other ~100 entries.
  * This exists because round-over-round bench drifts on a shared host
  * need the "solo min-of-2 A/B" protocol (BENCHNOTES: zq4/5/6 round 7,
  * sd1 round 8) — a full Bench run takes ~10 min and is itself a
  * co-tenancy source.
  *
  * Usage: `SPARK_GRAFT_ONLY=sd1_semdedup,dq2_minhash_neardup \
  *         sbt "runMain graft.tools.SoloProbe"`
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
  * Prints one JSON line `{"metric":"solo_probe","queries":{name:sec}}`.
  */
object SoloProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = sys.env.getOrElse("SPARK_GRAFT_ONLY", "sd1_semdedup")
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.install(spark)

    val unknown = only.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown query names: ${unknown.mkString(", ")}")

    // same pre-state as Bench: session warm, shared index + sidecars ensured
    spark.range(1000).count(): Unit
    val path = s"$sfDir/embeddings.parquet"
    spark.read.parquet(path).count(): Unit
    graft.ivf.IndexManager.ensure(spark, path, "embedding"): Unit
    graft.ivf.Sq8Sidecar.ensure(spark, path, "embedding")
    graft.ivf.PqSidecar.ensure(spark, path, "embedding", m = 8)

    only.foreach { name =>
      try graft.BenchTiming.materialize(graft.SparkEntry.queries(name)(spark, sfDir))
      catch { case e: Throwable => System.err.println(s"[solo] warm FAIL $name: $e") }
    }
    // diagnosis mode: per-rep wall times, with and without the harness's
    // per-rep clearCache, to stderr — separates "the cache-honesty change
    // uncovered hidden work" from "the machine drifted" for a flagged entry
    if (sys.env.get("SPARK_GRAFT_DIAG").contains("1")) only.foreach { name =>
      def rep(): Double = graft.BenchTiming.time(
        graft.BenchTiming.materialize(graft.SparkEntry.queries(name)(spark, sfDir)))
      val cleared = Seq.fill(4) { spark.catalog.clearCache(); rep() }
      val kept = Seq.fill(4)(rep())
      System.err.println(
        s"[diag] $name cleared=${cleared.map(t => f"$t%.3f").mkString(",")} " +
          s"kept=${kept.map(t => f"$t%.3f").mkString(",")}")
    }
    val results = only.map { name =>
      name -> graft.BenchTiming.timeMin()(
        graft.BenchTiming.materialize(graft.SparkEntry.queries(name)(spark, sfDir)))
    }
    val qs = results.map { case (n, v) => "\"" + n + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"solo_probe","sf":"$sfDir","queries":$qs}""")
    spark.stop()
  }
}
