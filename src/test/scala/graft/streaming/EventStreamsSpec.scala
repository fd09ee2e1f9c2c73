package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600L * 1000000L // one hour in micros

  test("stateful session count carries state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val events = input.toDF().toDF("user_id", "ts_us")
      .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"))
    val sessions = EventStreams.sessionize(spark, events)
    val query = sessions.writeStream
      .format("memory").queryName("sess_test").outputMode(OutputMode.Update())
      .start()
    // batch 1: user 1 has two events 10min apart (one session)
    input.addData((1L, 0L), (1L, 600L * 1000000L))
    query.processAllAvailable()
    // batch 2: user 1 returns 2 hours later (second session); user 2 appears
    input.addData((1L, 2L * H + 600L * 1000000L), (2L, 0L))
    query.processAllAvailable()
    query.stop()
    val last = spark.table("sess_test")
      .groupBy("user_id").agg(max("n_sessions").as("n_sessions"))
      .as[(Long, Long)].collect().toMap
    assert(last == Map(1L -> 2L, 2L -> 1L))
  }

  test("streaming lag features carry seq/gap/rolling state across batches; ties are peers") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val events = input.toDF().toDF("user_id", "event_id", "ts_us")
      .select(
        col("user_id"), col("event_id"), timestamp_micros(col("ts_us")).as("ts"))
    val feats = EventStreams.lagFeaturesStream(spark, events, H)
    val query = feats.writeStream
      .format("memory").queryName("lag_test").outputMode(OutputMode.Append())
      .start()
    // batch 1: user 1 at t=0 and two TIED events at t=10min
    input.addData((1L, 1L, 0L), (1L, 2L, 600L * H / 3600), (1L, 3L, 600L * H / 3600))
    query.processAllAvailable()
    // batch 2: user 1 at t=30min (gap must use batch-1 state; rolling
    // window still holds all three earlier events)
    input.addData((1L, 4L, 1800L * H / 3600))
    query.processAllAvailable()
    query.stop()
    val out = spark.table("lag_test")
      .select("event_id", "seq", "gap_us", "rolling_n")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), Option(r.get(2)).map(_.asInstanceOf[Long]), r.getLong(3))))
      .toMap
    val tenMin = 600L * 1000000L
    assert(out(1L) == ((1, None, 1L)))
    // tied peers: both count the full peer group in rolling_n; the second
    // peer's gap is 0 (same timestamp)
    assert(out(2L) == ((2, Some(tenMin), 3L)))
    assert(out(3L) == ((3, Some(0L), 3L)))
    // cross-batch: gap from the last batch-1 event, window holds all 4
    assert(out(4L) == ((4, Some(2L * tenMin), 4L)))
  }

  test("streaming user counts accumulate across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val events = input.toDF().toDF("user_id")
    val counts = EventStreams.userCounts(spark, events)
    val query = counts.writeStream
      .format("memory").queryName("cnt_test").outputMode(OutputMode.Update())
      .start()
    input.addData(1L, 1L, 2L)
    query.processAllAvailable()
    input.addData(1L, 2L)
    query.processAllAvailable()
    query.stop()
    val last = spark.table("cnt_test")
      .groupBy("user_id").agg(max("n").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(last == Map(1L -> 3L, 2L -> 2L))
  }

  test("streaming hourly counts over the events fixture equal the batch answer") {
    val stream = EventStreams.readStream(spark, "/root/testdata/sf0.001")
    val streamed = EventStreams
      .replayToTable(spark, EventStreams.hourlyCounts(stream), OutputMode.Complete())
      .orderBy("hour", "event_type")
      .collect()
    val batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .groupBy(
        date_format(col("ts"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("hour", "event_type")
      .collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("batch sessionization matches a hand-computed fixture") {
    val df = Seq(
      (1L, 0L), (1L, 10L * 60L * 1000000L), // same session (10 min gap)
      (1L, 2L * H), // new session
      (2L, 0L))
      .toDF("user_id", "ts_us")
      .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"))
    val result = EventStreams.sessionCounts(df)
      .as[(Long, Long)].collect().toMap
    assert(result == Map(1L -> 2L, 2L -> 1L))
  }
}
