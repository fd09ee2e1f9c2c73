package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0L until 200L).map(i => (i, s"corpus doc $i"))
    .toDF("id", "text")
  // 30 rows: 10 exact dups of corpus docs, 20 novel
  private def batch = ((0L until 10L).map(i => (1000L + i, s"corpus doc ${i * 7}")) ++
    (0L until 20L).map(i => (2000L + i, s"novel doc $i")))
    .toDF("id", "text")

  test("sharded bloom has no false negatives: every corpus key might-contains") {
    val blooms = Dedup.shardedBloom(corpus, col("text"), expectedItems = 256L)
    val misses = corpus
      .where(!Dedup.mightContain(blooms, col("text")))
      .count()
    assert(misses == 0L)
  }

  test("exactNovelAgainst is bit-equal to the plain anti-join") {
    val novel = Dedup
      .exactNovelAgainst(corpus, batch, col("text"), expectedItems = 256L)
      .select(col("id")).as[Long].collect().sorted.toSeq
    val expected = batch
      .join(corpus.select(col("text")), Seq("text"), "left_anti")
      .select(col("id")).as[Long].collect().sorted.toSeq
    assert(novel == expected)
    assert(novel == (2000L until 2020L))
  }

  test("exactNovelAgainst stays exact under a deliberately tiny, high-fpp filter") {
    // 64 items expected vs 200 inserted at fpp 0.5 — most novel rows become
    // bloom-positive candidates; the verify join must still keep them all
    val novel = Dedup
      .exactNovelAgainst(
        corpus, batch, col("text"),
        expectedItems = 64L, fpp = 0.5, shards = 1)
      .select(col("id")).as[Long].collect().sorted.toSeq
    assert(novel == (2000L until 2020L))
  }

  test("shuffle-join verify fork (broadcastCandidates = false) matches") {
    val novel = Dedup
      .exactNovelAgainst(
        corpus, batch, col("text"),
        expectedItems = 256L, shards = 3, broadcastCandidates = false)
      .select(col("id")).as[Long].collect().sorted.toSeq
    assert(novel == (2000L until 2020L))
  }

  test("empty shards get a total (empty) filter; single-row corpus works") {
    // 1 corpus row across 8 shards — 7 shards see no key and must still
    // answer (false) instead of failing the probe CASE
    val one = Seq((1L, "only doc")).toDF("id", "text")
    val blooms = Dedup.shardedBloom(one, col("text"), expectedItems = 64L, shards = 8)
    assert(blooms.length == 8 && blooms.forall(_ != null))
    val novel = Dedup
      .exactNovelAgainst(one, batch, col("text"), blooms, broadcastCandidates = true)
      .count()
    assert(novel == batch.count())
  }

  test("streaming novelty filter over micro-batches equals the batch answer") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("id", "text")
    val novel = Dedup
      .exactNovelAgainstStream(corpus, stream, col("text"), expectedItems = 256L)
    val query = novel.writeStream
      .format("memory").queryName("bloom_novel_test")
      .outputMode(OutputMode.Append()).start()
    // split the batch across two micro-batches — dups and novels in both
    val rows = batch.as[(Long, String)].collect().sortBy(_._1)
    val (first, second) = rows.splitAt(rows.length / 2)
    input.addData(first.toSeq)
    query.processAllAvailable()
    input.addData(second.toSeq)
    query.processAllAvailable()
    query.stop()
    val streamed = spark.table("bloom_novel_test")
      .select("id").as[Long].collect().sorted.toSeq
    assert(streamed == (2000L until 2020L))
  }

  test("bloom sketch persists, reads back, and extends losslessly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    val blooms = Dedup.shardedBloom(
      corpus, col("text"), expectedItems = 256L, shards = 4)
    Dedup.writeBloom(spark, blooms, s"$dir/bloom")
    val back = Dedup.readBloom(spark, s"$dir/bloom")
    assert(back.length == 4)
    assert(back.zip(blooms).forall { case (a, b) => a.sameElements(b) })
    // extend with the batch: every batch key must now might-contain
    val extended = Dedup.extendBloom(back, batch, col("text"), expectedItems = 256L)
    val misses = batch
      .where(!Dedup.mightContain(extended, col("text")))
      .count()
    assert(misses == 0L)
    // and the original corpus keys are still present (no-false-negative
    // survives the merge)
    val corpusMisses = corpus
      .where(!Dedup.mightContain(extended, col("text")))
      .count()
    assert(corpusMisses == 0L)
  }

  test("extendBloom merges past empty-shard fillers at real sketch sizes") {
    // perShard = 100000/4 = 25000 > the 64 floor: a filler created at the
    // wrong (64-item) geometry would throw IncompatibleMergeException here
    val one = Seq((1L, "lonely corpus doc")).toDF("id", "text")
    val sketch = Dedup.shardedBloom(
      one, col("text"), expectedItems = 100000L, shards = 4)
    val extended = Dedup.extendBloom(
      sketch, batch, col("text"), expectedItems = 100000L)
    assert(batch.where(!Dedup.mightContain(extended, col("text"))).count() == 0L)
    assert(one.where(!Dedup.mightContain(extended, col("text"))).count() == 0L)
  }

  test("parameter validation fails fast") {
    intercept[IllegalArgumentException](
      Dedup.shardedBloom(corpus, col("text"), expectedItems = 0L))
    intercept[IllegalArgumentException](
      Dedup.shardedBloom(corpus, col("text"), expectedItems = 10L, fpp = 1.5))
    intercept[IllegalArgumentException](
      Dedup.shardedBloom(corpus, col("text"), expectedItems = 10L, shards = 0))
  }
}
