package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway stage-by-stage profile of the simhash dedup pipeline. */
object ProfileSimhash {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.install(spark)
    import graft.ops.Dedup
    val df = spark.read.parquet(s"$sfDir/documents.parquet")

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $label: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      timed("simhash_only") {
        df.select(Dedup.simhash64(split(trim(col("text")), "\\s+")).as("sim"))
          .queryExecution.toRdd.count()
      }
      timed("shingles_only") {
        df.select(Dedup.shingles(col("text"), 3).as("sh"))
          .queryExecution.toRdd.count()
      }
      val hashed = df.select(col("doc_id").as("id"),
        Dedup.simhash64(split(trim(col("text")), "\\s+")).as("sim"))
        .persist()
      timed("persist_hashed") { hashed.count() }
      val numBlocks = 8; val blockBits = 8; val blockMask = 255L
      val blocks = hashed.select(
        col("id"), col("sim"),
        explode(array((0 until numBlocks).map { b =>
          struct(lit(b).as("block"),
            shiftright(col("sim"), b * blockBits).bitwiseAND(lit(blockMask)).as("val"))
        }: _*)).as("blk"))
        .select(col("id"), col("sim"), col("blk.block"), col("blk.val"))
      val candsNoDistinct = blocks.as("a")
        .join(blocks.as("b"),
          col("a.block") === col("b.block") && col("a.val") === col("b.val") &&
            col("a.id") < col("b.id"))
      timed("bucket_join_pairs") { candsNoDistinct.queryExecution.toRdd.count() }
      val withHam = blocks.as("a")
        .join(blocks.as("b"),
          col("a.block") === col("b.block") && col("a.val") === col("b.val") &&
            col("a.id") < col("b.id") &&
            bit_count(col("a.sim").bitwiseXOR(col("b.sim"))) <= 16)
        .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      timed("bucket_join_hamming") { withHam.queryExecution.toRdd.count() }
      val cands = withHam.distinct()
      timed("cands_distinct") { cands.queryExecution.toRdd.count() }
      val docs = df.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
        .where(size(col("sh")) > 0)
      val verified = cands
        .join(docs.select(col("id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .join(docs.select(col("id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .withColumn("j", Dedup.jaccard(col("sh_a"), col("sh_b")))
        .where(col("j") >= 0.5)
      timed("verify_jaccard") { verified.queryExecution.toRdd.count() }
      hashed.unpersist()
      timed("full_query") {
        graft.SparkEntry.queries("dq3_simhash_neardup")(spark, sfDir)
          .queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
