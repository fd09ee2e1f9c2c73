package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway: stage timings/volumes for the two-path simhash candidate
  * pipeline (small-bucket join ∪ hot-bucket second-block refinement).
  */
object MeasureSimhash {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Dedup
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    val (numBlocks, blockBits, blockMask, hammingMax, cap) = (8, 8, 255L, 16, 200L)

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $label: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val hashed = df.select(col("doc_id").as("id"),
        Dedup.simhash64(split(trim(col("text")), "\\s+")).as("sim")).persist()
      timed("persist_hashed") { hashed.count() }
      val blocks = hashed.select(col("id"), col("sim"),
        explode(array((0 until numBlocks).map { b =>
          struct(lit(b).as("block"),
            shiftright(col("sim"), b * blockBits).bitwiseAND(lit(blockMask)).as("val"))
        }: _*)).as("blk"))
        .select(col("id"), col("sim"), col("blk.block"), col("blk.val"))
      val sizes = blocks.groupBy(col("block"), col("val")).agg(count(lit(1)).as("n"))
      val small = blocks.join(
        sizes.where(col("n") >= 2 && col("n") <= cap).select("block", "val"),
        Seq("block", "val"))
      def pairJoin(side: DataFrame, keys: Seq[String]): DataFrame =
        side.as("a").join(side.as("b"),
          keys.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _) &&
            col("a.id") < col("b.id") &&
            bit_count(col("a.sim").bitwiseXOR(col("b.sim"))) <= hammingMax)
          .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      val hot = blocks.join(
        sizes.where(col("n") > cap).select("block", "val"), Seq("block", "val"))
      val refined = hot.select(col("id"), col("sim"), col("block"), col("val"),
        explode(array((0 until numBlocks).map { b =>
          struct(lit(b).as("block"),
            shiftright(col("sim"), b * blockBits).bitwiseAND(lit(blockMask)).as("val"))
        }: _*)).as("blk2"))
        .where(col("blk2.block") =!= col("block"))
        .select(col("id"), col("sim"), col("block"), col("val"),
          col("blk2.block").as("block2"), col("blk2.val").as("val2"))
      timed("small_members") { small.queryExecution.toRdd.count() }
      timed("hot_members") { hot.queryExecution.toRdd.count() }
      timed("refined_keys") { refined.queryExecution.toRdd.count() }
      timed("small_pairs") { pairJoin(small, Seq("block", "val")).queryExecution.toRdd.count() }
      timed("refined_pairs") {
        pairJoin(refined, Seq("block", "val", "block2", "val2")).queryExecution.toRdd.count()
      }
      val cands = pairJoin(small, Seq("block", "val"))
        .union(pairJoin(refined, Seq("block", "val", "block2", "val2")))
        .distinct()
      timed("cands_distinct") { cands.queryExecution.toRdd.count() }
      // hamming histogram of the surviving candidates: how discriminative is
      // the prefilter threshold?
      val sims = hashed.select(col("id"), col("sim"))
      val hist = cands
        .join(sims.select(col("id").as("doc_a"), col("sim").as("sim_a")), "doc_a")
        .join(sims.select(col("id").as("doc_b"), col("sim").as("sim_b")), "doc_b")
        .groupBy(bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("h"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("h"))
        .collect()
      hist.foreach(r => println(s"  hamming=${r.get(0)} n=${r.get(1)}"))
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
