package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BPE trainer scale probe (round-10 verdict item #5): time
  * [[graft.ops.Bpe.trainMergesLocal]] at a production-shaped merge count
  * (default 1000) on the 500k-doc TextScaleBench corpus, against the
  * SQL-form [[graft.ops.Bpe.trainMerges]] at a small merge count to
  * project its per-merge sequential-job cost. Also asserts the two
  * trainers agree on the shared prefix — the equality spec at corpus
  * scale. NOT part of the round bench; run manually, record in
  * BENCHNOTES.md:
  * `sbt "runMain graft.tools.BpeScaleProbe"`
  * (env: SPARK_GRAFT_BPE_MERGES, SPARK_GRAFT_BPE_SEQ_MERGES,
  * SPARK_GRAFT_TEXTSCALE_DIR).
  */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val nLocal = sys.env.getOrElse("SPARK_GRAFT_BPE_MERGES", "1000").toInt
    val nSeq = sys.env.getOrElse("SPARK_GRAFT_BPE_SEQ_MERGES", "16").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = TextScaleBench.ensureCorpus(spark)
    val docs = spark.read.parquet(dir)
    docs.count(): Unit // warm FS/page cache

    val t0 = System.nanoTime()
    val local = graft.ops.Bpe.trainMergesLocal(docs, "text", nLocal)
    val tLocal = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val seqForm = graft.ops.Bpe.trainMerges(docs, "text", nSeq)
    val tSeq = (System.nanoTime() - t1) / 1e9

    require(local.take(nSeq) == seqForm,
      s"trainer divergence on shared prefix:\nlocal=${local.take(nSeq)}\nseq=$seqForm")

    val vocabRows = docs
      .select(explode(graft.ops.TextAnalysis.tokens(col("text"))).as("w"))
      .where(col("w") =!= "").distinct().count()
    val perMergeSeq = tSeq / nSeq
    println(
      f"""{"metric":"bpe_scale","rows":${docs.count()},"distinct_words":$vocabRows,""" +
        f""""local_merges":$nLocal,"local_sec":$tLocal%.3f,""" +
        f""""seq_merges":$nSeq,"seq_sec":$tSeq%.3f,"seq_per_merge_sec":$perMergeSeq%.4f,""" +
        f""""seq_projected_sec_at_local_merges":${perMergeSeq * nLocal}%.1f,""" +
        f""""prefix_equal":true}""")
    spark.stop()
  }
}
