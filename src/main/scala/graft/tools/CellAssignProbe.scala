package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the by-cell relayout's cell-assignment projection (review
  * r11): the codegen'd [[graft.functions.nearest_centroid]] expression vs
  * the Scala-UDF form `Layout.writeByCell` used to build (Seq[Float] boxing
  * + a defensive toArray copy per row). Isolated from the write path like
  * [[ZRankProbe]]: sum of assigned cells over N rows, parity asserted.
  *
  * NOT part of the per-round bench; run manually and record in
  * BENCHNOTES.md: `sbt "runMain graft.tools.CellAssignProbe"`
  * (env: SPARK_GRAFT_CELLASSIGN_ROWS default 1M, _DIM default 256,
  * _K default 1024).
  */
object CellAssignProbe {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_CELLASSIGN_ROWS", "1000000").toLong
    val dim = sys.env.getOrElse("SPARK_GRAFT_CELLASSIGN_DIM", "256").toInt
    val k = sys.env.getOrElse("SPARK_GRAFT_CELLASSIGN_K", "1024").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rnd = new scala.util.Random(7)
    val centroids = Array.fill(k * dim)(rnd.nextFloat())
    // deterministic per-row synthetic vector, no RNG state per task
    val vec = transform(
      sequence(lit(0), lit(dim - 1)),
      j => pmod(xxhash64(col("id"), j), lit(1000L)).cast("float") / 1000f)
    val df = spark.range(rows).select(col("id"), vec.as("v"))
      .select(col("id"), col("v").cast("array<float>").as("v"))
      .localCheckpoint() // materialize once so both arms time ONLY assignment

    val kernel = coalesce(
      graft.functions.nearest_centroid(col("v"), centroids, dim), lit(-1))
    val bc = spark.sparkContext.broadcast(centroids)
    val d = dim
    val assignUdf = org.apache.spark.sql.functions.udf { (vec: Seq[Float]) =>
      if (vec == null || vec.length != d) -1
      else graft.functions.VectorKernels.nearestCentroid(vec.toArray, bc.value, d)
    }
    val udfArm = assignUdf(col("v"))

    def run(name: String, e: org.apache.spark.sql.Column): Double = {
      df.select(sum(e)).head() // warm
      val t = graft.BenchTiming.timeMin("cellassign") {
        df.select(sum(e)).head(): Unit
      }
      println(f"[cellassign] $name%-8s $t%.3f s  ($rows rows, dim=$dim, k=$k)")
      t
    }
    val sk = df.select(sum(kernel)).head().getLong(0)
    val su = df.select(sum(udfArm)).head().getLong(0)
    require(sk == su, s"assignment sums differ: kernel $sk vs udf $su")
    println(s"[cellassign] assignment parity OK ($sk)")
    val tk = run("kernel", kernel)
    val tu = run("udf", udfArm)
    println(f"[cellassign] speedup ${tu / tk}%.2fx")
    spark.stop()
  }
}
