package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual check harness for [[graft.ops.Dedup.simhashNearDupPairs]] at the
  * [[TextScaleBench]] scale: times the operator and counts its verified
  * pairs, so a candidate-generation change can be checked against the
  * previous implementation's pair count (146,416 on the 500k-doc v2 corpus)
  * before trusting the bench number. Not part of any round gate; run
  * manually: `sbt "runMain graft.tools.SimhashProfile"`.
  */
object SimhashProfile {

  def main(args: Array[String]): Unit = {
    val corpus = sys.env.getOrElse(
      "SPARK_GRAFT_TEXTSCALE_CORPUS", "/root/repo/.graft/scale/docs_500000_v2")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val df = spark.read.parquet(corpus)
    val t0 = System.nanoTime()
    val n = graft.ops.Dedup.simhashNearDupPairs(df, "doc_id", "text").count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"simhash verified pairs=$n%d sec=$sec%.2f")
    spark.stop()
  }
}
