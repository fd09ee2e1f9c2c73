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

  test("late session events never regress the high-water mark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val events = input.toDF().toDF("user_id", "ts_us")
      .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"))
    val sessions = EventStreams.sessionize(spark, events)
    val query = sessions.writeStream
      .format("memory").queryName("sess_late_test").outputMode(OutputMode.Update())
      .start()
    val M = 60L * 1000000L
    // batch 1: events at t=0 and t=10min (one session, mark at 10min)
    input.addData((1L, 0L), (1L, 10L * M))
    query.processAllAvailable()
    // batch 2: a LATE event at t=5min — joins the session; the mark must
    // stay at 10min (the regressed mark made the next event split falsely)
    input.addData((1L, 5L * M))
    query.processAllAvailable()
    // batch 3: t=35min — 25min after the true mark, INSIDE the 30-min gap
    input.addData((1L, 35L * M))
    query.processAllAvailable()
    query.stop()
    val n = spark.table("sess_late_test")
      .groupBy("user_id").agg(max("n_sessions").as("n_sessions"))
      .as[(Long, Long)].collect().toMap
    assert(n == Map(1L -> 1L), s"still one session, got $n")
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

  test("late lag-feature rows get predecessor gaps, never negative ones") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val events = input.toDF().toDF("user_id", "event_id", "ts_us")
      .select(
        col("user_id"), col("event_id"), timestamp_micros(col("ts_us")).as("ts"))
    val feats = EventStreams.lagFeaturesStream(spark, events, H)
    val query = feats.writeStream
      .format("memory").queryName("lag_late_test").outputMode(OutputMode.Append())
      .start()
    val tenMin = 600L * 1000000L
    // batch 1 advances user 1 to t=20min (and user 2 to t=2h)
    input.addData((1L, 1L, 0L), (1L, 2L, 2 * tenMin), (2L, 10L, 0L), (2L, 11L, 2L * H))
    query.processAllAvailable()
    // batch 2: user 1's t=10min arrives LATE (predecessor t=0 still in
    // state -> gap is the batch twin's 10min, NOT 10min-20min = -10min);
    // user 2's t=1.5h arrives late with its predecessor (t=0) already
    // pruned by the t=2h event's window -> gap unknowable -> null
    input.addData((1L, 3L, tenMin), (2L, 12L, H + H / 2))
    query.processAllAvailable()
    query.stop()
    val out = spark.table("lag_late_test")
      .select("event_id", "gap_us")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(out(3L) == Some(tenMin), s"late gap ${out(3L)}")
    assert(out(12L).isEmpty, s"expired-predecessor gap ${out(12L)}")
    // in-order rows unaffected
    assert(out(1L).isEmpty && out(2L) == Some(2 * tenMin))
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

  test("lag-feature state is RLE-bounded for a hot key (100k tied events)") {
    // bot burst: 200k events across only 100 distinct timestamps inside one
    // window — the r9 per-event state would hold 200k longs; RLE holds 100
    var st = EventStreams.LagState(0, Long.MinValue, Vector.empty, 0L)
    var seen = 0L
    for (g <- 0 until 100) {
      val (next, rolling) =
        EventStreams.advanceLag(st, g.toLong, 2000, windowUs = H,
          maxDistinctTs = EventStreams.DefaultMaxDistinctTs)
      seen += 2000
      assert(rolling == seen) // nothing expired inside the window: exact
      st = next
    }
    assert(st.recent.length == 100)
    assert(st.inWindow == 200000L)
    assert(st.seq == 200000)
    // advancing past the window expires the whole burst
    val (aged, rollingAfter) =
      EventStreams.advanceLag(st, 100L + H, 1, H, EventStreams.DefaultMaxDistinctTs)
    assert(rollingAfter == 1L + st.recent.count(_._1 >= 100L)) // entries at ts>=100: none
    assert(aged.recent.length == 1)
  }

  test("lag-feature saturation cap conserves count mass and upper-bounds rolling") {
    // adversarial key: every event at a DISTINCT timestamp, cap at 64 —
    // state must stay <= 64 entries with the total count conserved, and
    // rolling_n must never undercount the true window population
    val cap = 64
    var st = EventStreams.LagState(0, Long.MinValue, Vector.empty, 0L)
    val n = 10000
    for (t <- 0 until n) {
      val (next, rolling) = EventStreams.advanceLag(st, t.toLong, 1, H, cap)
      assert(next.recent.length <= cap)
      assert(next.recent.map(_._2).sum == next.inWindow) // mass conserved
      assert(rolling >= math.min(t + 1, cap).toLong) // never undercounts
      assert(rolling == t + 1L) // window spans all: exact regardless of cap
      st = next
    }
    assert(st.recent.length == cap)
    assert(st.inWindow == n.toLong)
    // merged-oldest semantics: expiry past the window still drains to empty
    val (drained, _) = EventStreams.advanceLag(st, n.toLong + H + 1, 1, H, cap)
    assert(drained.recent.length == 1 && drained.inWindow == 1L)
  }

  test("late lag-feature arrivals insert in order; later pruning stays exact") {
    // in-order prefix: events at ts 0, 10, 20 (window H covers all)
    var st = EventStreams.LagState(0, Long.MinValue, Vector.empty, 0L)
    for (t <- Seq(0L, 10L, 20L))
      st = EventStreams.advanceLag(st, t, 1, H, 64)._1
    // LATE event at ts=5 (an earlier batch already advanced to 20):
    // must land between 0 and 10, not after 20
    val (lateSt, lateRolling) = EventStreams.advanceLag(st, 5L, 1, H, 64)
    assert(lateSt.recent.map(_._1) == Vector(0L, 5L, 10L, 20L)) // ascending kept
    assert(lateRolling == 2L) // its own window [5-H, 5] sees ts 0 and itself
    assert(lateSt.lastUs == 20L) // high-water mark never moves backward
    assert(lateSt.inWindow == 4L)
    // advance far enough that ts 0 and 5 expire but 10 and 20 survive:
    // the head-prefix prune must drop BOTH stale entries (the r10 append
    // form stranded the late entry behind ts=20 and overcounted forever)
    val (pruned, rolling) = EventStreams.advanceLag(lateSt, 9L + H, 1, H, 64)
    assert(pruned.recent.map(_._1) == Vector(10L, 20L, 9L + H))
    assert(rolling == 3L) // 10, 20, and the new event — stale mass gone
    // duplicate-timestamp late arrival merges onto the existing entry
    val (mergedSt, _) = EventStreams.advanceLag(pruned, 10L, 2, H + 100L, 64)
    assert(mergedSt.recent.map(_._1) == Vector(10L, 20L, 9L + H))
    assert(mergedSt.recent.head._2 == 3L)
  }

  test("streaming lag features under a tiny cap still match on sub-cap keys") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val events = input.toDF().toDF("user_id", "event_id", "ts_us")
      .select(
        col("user_id"), col("event_id"),
        timestamp_micros(col("ts_us")).as("ts"))
    val feats = EventStreams.lagFeaturesStream(spark, events, H, maxDistinctTs = 2)
    val query = feats.writeStream
      .format("memory").queryName("lag_cap_test").outputMode(OutputMode.Append())
      .start()
    // 3 distinct timestamps within one window: entries 1+2 merge onto ts2
    // under cap=2; rolling at ts3 still counts all three (mass conserved)
    input.addData((1L, 1L, 0L), (1L, 2L, 10L), (1L, 3L, 20L))
    query.processAllAvailable()
    query.stop()
    val out = spark.table("lag_cap_test")
      .select("event_id", "rolling_n").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }
}
