package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Watermark late-data semantics (the behavior st11 gates through the
  * DuckDB oracle): a slice arriving AFTER the watermark has advanced is
  * dropped when its hour window has fallen below the watermark, and
  * Append mode emits each window exactly once when the watermark passes
  * its end. Also pins the trap this test exists to document: watermark
  * advancement is per COMMITTED trigger, so the late arrival must land in
  * a second drain — pre-staged files processed back-to-back in one drain
  * all run under the initial watermark and nothing is late.
  */
class LateDataSpec extends SparkSpec {

  test("late slice drops below the advanced watermark; windows emit once") {
    val sfDir = "/root/testdata/sf0.001"
    val ev = spark.read
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
    val stage = java.nio.file.Files.createTempDirectory("graft-late").toString
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-late-w").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, new java.io.File(stage, name).toPath): Unit
    }
    writeOne(ev.where(col("event_id") % 4 =!= 0), "a.parquet")
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
    val query = EventStreams.hourlyCounts(stream).writeStream
      .format("memory").queryName("late_spec")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-late-ckpt").toString)
      .start()
    query.processAllAvailable()
    writeOne(ev.where(col("event_id") % 4 === 0), "b.parquet")
    query.processAllAvailable()
    query.processAllAvailable() // no-data batch: advance wm, finalize
    val dropped = query.recentProgress
      .flatMap(_.stateOperators.headOption).map(_.numRowsDroppedByWatermark).sum
    query.stop()

    // expected: the two-watermark rule (ms floors, like Spark's tracker)
    val floorMs = (c: org.apache.spark.sql.Column) =>
      (unix_micros(c.cast("timestamp")) / 1000L).cast("bigint")
    val a = ev.where(col("event_id") % 4 =!= 0)
    val wmB = a.agg(max(floorMs(col("ts")))).head().getLong(0) - 3600000L
    val wmF = ev.agg(max(floorMs(col("ts")))).head().getLong(0) - 3600000L
    val winEnd = floorMs(date_trunc("hour", col("ts"))) + 3600000L
    val expected = a.where(winEnd <= wmF)
      .unionByName(ev.where(col("event_id") % 4 === 0)
        .where(winEnd > wmB && winEnd <= wmF))
      .groupBy(
        date_format(col("ts").cast("timestamp"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = spark.table("late_spec")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected)
    // the late slice really was filtered by the watermark, not merely unemitted
    assert(dropped > 0L, "expected watermark drops in the late batch")
    assert(got.values.sum < ev.count())
  }
}
