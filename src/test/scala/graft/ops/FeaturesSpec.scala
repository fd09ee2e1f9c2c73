package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("lagFeatures: rank, gap, and range-framed rolling count per key") {
    // user 1: events at 0s, 10s, 3610s; user 2: one event
    val df = Seq(
      (1L, 1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00")),
      (2L, 1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:10")),
      (3L, 1L, java.sql.Timestamp.valueOf("2026-01-01 01:00:10")),
      (4L, 2L, java.sql.Timestamp.valueOf("2026-01-01 00:00:05")))
      .toDF("event_id", "user_id", "ts")
    val out = Features
      .lagFeatures(df, col("user_id"), col("ts"), col("event_id"), 3600L * 1000000L)
      .select("event_id", "seq", "gap_us", "rolling_n")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), Option(r.get(2)).map(_.asInstanceOf[Long]), r.getLong(3))))
      .toMap
    assert(out(1L) == ((1, None, 1L)))
    assert(out(2L) == ((2, Some(10000000L), 2L)))
    // 3610s event: 1h window [10s, 3610s] still contains the 10s event
    assert(out(3L) == ((3, Some(3600000000L), 2L)))
    assert(out(4L) == ((1, None, 1L)))
    // the three windows share ONE exchange (same key partitioning)
    val exchanges = Features
      .lagFeatures(df.repartition(3), col("user_id"), col("ts"), col("event_id"), 1000000L)
      .queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 2, s"expected scramble + one key exchange, got $exchanges")
    intercept[IllegalArgumentException](
      Features.lagFeatures(df, col("user_id"), col("ts"), col("event_id"), -1L))
    // output-name collision refuses instead of silently overwriting
    intercept[IllegalArgumentException](
      Features.lagFeatures(
        df.withColumn("seq", col("event_id")),
        col("user_id"), col("ts"), col("event_id"), 1000000L))
  }

  test("sq8MeanPool floors negative code sums (not truncates)") {
    // vectors at -1.0 and near 0: codes -127 and 0 → sum -127 over 2
    // members → floor(-63.5) = -64 (truncation would give -63)
    val df = Seq(
      (0L, Seq(-1.0f)),
      (1L, Seq(0.0f))).toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<float>").as("v"))
    val pooled = Quantize.sq8MeanPool(df, lit(0L), "v")
      .as[(Long, Int, Long)].collect().toSeq
    assert(pooled == Seq((0L, 0, -64L)), s"got $pooled")
  }
}
