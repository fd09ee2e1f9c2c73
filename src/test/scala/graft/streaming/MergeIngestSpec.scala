package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MergeIngestSpec extends SparkSpec {
  import spark.implicits._

  test("per-batch merges version the snapshot; latestDir and prune work") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mergeingest").toString
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    // two key-disjoint update files → two micro-batches
    val stage = s"$dir/stage"
    Seq((2L, "b2", false)).toDF("k", "v", "del")
      .coalesce(1).write.mode("overwrite").parquet(stage)
    Seq((3L, "dead", true), (4L, "d", false)).toDF("k", "v", "del")
      .coalesce(1).write.mode("append").parquet(stage)
    val table = s"$dir/t"
    val stream = spark.readStream
      .schema(Seq((0L, "", false)).toDF("k", "v", "del").schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
    val n = MergeIngest.ingest(
      spark, stream, base, table, "k", tombstoneCol = Some("del"))
    assert(n == 2)
    // final content: update applied, tombstone deleted, insert present
    val latest = MergeIngest.latestDir(spark, table)
    assert(latest.endsWith("/v2"))
    val out = spark.read.parquet(latest)
      .select("k", "v").as[(Long, String)].collect().sorted.toSeq
    assert(out == Seq((1L, "a"), (2L, "b2"), (4L, "d")))
    // all three versions exist (v0 seed + one per batch) until pruned
    def versions() = new java.io.File(table).listFiles()
      .map(_.getName).filter(_.matches("v\\d+")).sorted.toSeq
    assert(versions() == Seq("v0", "v1", "v2"))
    // intermediate snapshot is a complete consistent state
    val v1 = spark.read.parquet(s"$table/v1")
      .select("k").as[Long].collect().sorted.toSeq
    assert(v1.size == 3 || v1.size == 4) // depends on batch order; complete either way
    MergeIngest.prune(spark, table, keep = 1)
    assert(versions() == Seq("v2"))
    // a second ingest call on the drained checkpoint applies nothing
    val again = spark.readStream
      .schema(Seq((0L, "", false)).toDF("k", "v", "del").schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
    assert(MergeIngest.ingest(
      spark, again, base, table, "k", tombstoneCol = Some("del")) == 0)
    assert(versions() == Seq("v2"))
  }

  test("latestDir skips uncommitted (no _SUCCESS) version dirs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mi-commit").toString
    Seq((1L, "a")).toDF("k", "v").write.parquet(s"$dir/v0")
    // simulate a crash mid-write of v1: dir exists, part file present, no
    // _SUCCESS marker — readers must keep resolving v0
    Seq((1L, "half")).toDF("k", "v").write.parquet(s"$dir/v1")
    assert(new java.io.File(s"$dir/v1/_SUCCESS").delete())
    assert(MergeIngest.latestDir(spark, dir).endsWith("/v0"))
    // an empty uncommitted dir (crash before any part file) is skipped too
    assert(new java.io.File(s"$dir/v2").mkdir())
    assert(MergeIngest.latestDir(spark, dir).endsWith("/v0"))
  }
}
