package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val a = Seq(
    (1L, 0L, 10L), // overlaps b10 (touch at 10? closed: [0,10] vs [10,20] -> yes)
    (2L, 15L, 18L), // inside b10
    (3L, 100L, 101L), // overlaps nothing
    (4L, -25L, -5L) // negative range, overlaps b40
  ).toDF("a_id", "a_s", "a_e")

  private lazy val b = Seq(
    (10L, 10L, 20L),
    (40L, -10L, -1L),
    (50L, 300L, 280L) // inverted: matches nothing, must not blow up
  ).toDF("b_id", "b_s", "b_e")

  test("overlapJoin: closed-interval semantics, negatives, inverted intervals, pair-once") {
    val got = Intervals
      .overlapJoin(a, col("a_s"), col("a_e"), b, col("b_s"), col("b_e"), binWidth = 7L)
      .select("a_id", "b_id").as[(Long, Long)].collect()
    // no duplicates even though intervals span several 7-wide bins
    assert(got.length == got.distinct.length, s"duplicate pairs: ${got.toSeq}")
    assert(got.toSet == Set((1L, 10L), (2L, 10L), (4L, 40L)))
  }

  test("overlapJoin matches a brute-force cross join on random intervals") {
    val rng = new scala.util.Random(7)
    val xs = Seq.tabulate(120) { i =>
      val s = rng.nextInt(1000).toLong - 500
      (i.toLong, s, s + rng.nextInt(60))
    }
    val ys = Seq.tabulate(120) { i =>
      val s = rng.nextInt(1000).toLong - 500
      (1000L + i, s, s + rng.nextInt(60))
    }
    val l = xs.toDF("a_id", "a_s", "a_e")
    val r = ys.toDF("b_id", "b_s", "b_e")
    val got = Intervals
      .overlapJoin(l, col("a_s"), col("a_e"), r, col("b_s"), col("b_e"), binWidth = 25L)
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
    val expected = (for {
      (xi, xs_, xe) <- xs
      (yi, ys_, ye) <- ys
      if xs_ <= ye && ys_ <= xe
    } yield (xi, yi)).sorted
    assert(got == expected)
  }

  test("overlapJoin refuses an interval overflowing maxBinsPerInterval") {
    val wide = Seq((1L, 0L, 1000000L)).toDF("a_id", "a_s", "a_e")
    val narrow = Seq((2L, 5L, 6L)).toDF("b_id", "b_s", "b_e")
    val ex = intercept[Exception] {
      Intervals.overlapJoin(
        wide, col("a_s"), col("a_e"), narrow, col("b_s"), col("b_e"),
        binWidth = 10L, maxBinsPerInterval = 100).collect()
    }
    assert(ex.getMessage != null)
    // and succeeds once binWidth is sized to the data
    val ok = Intervals.overlapJoin(
      wide, col("a_s"), col("a_e"), narrow, col("b_s"), col("b_e"),
      binWidth = 100000L).select("a_id", "b_id").as[(Long, Long)].collect()
    assert(ok.toSet == Set((1L, 2L)))
  }

  test("auto bin width survives a long-tailed fixture the mean or raw p99 would explode") {
    // 990 short spans (~10 units) + 10 giant spans (1e6 units): a naive
    // typical-span guess of 10 puts the giants at 1e5 bins — over the 4096
    // guard — and a raw p99 can land anywhere in [10, 1e6] depending on
    // where the sketch's 99th percentile falls relative to the 1% tail.
    // The auto width additionally clamps by sampledMax/(maxBins/2), so the
    // giants cover ≤ 2048 bins whatever the sketch says: the guard cannot
    // trip regardless of partitioning, and the result matches an
    // explicitly-sized run (bin width never changes join semantics).
    val rng = new scala.util.Random(11)
    val tailA = Seq.tabulate(1000) { i =>
      val s = rng.nextInt(100000).toLong
      val span = if (i % 100 == 99) 1000000L else rng.nextInt(10).toLong + 1
      (i.toLong, s, s + span)
    }
    val shortB = Seq.tabulate(200) { i =>
      val s = rng.nextInt(100000).toLong
      (2000L + i, s, s + rng.nextInt(20))
    }
    val explicit = Intervals
      .overlapJoin(
        tailA.toDF("a_id", "a_s", "a_e"), col("a_s"), col("a_e"),
        shortB.toDF("b_id", "b_s", "b_e"), col("b_s"), col("b_e"),
        binWidth = 1000000L)
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
    assert(explicit.nonEmpty)
    // partition-invariance: the percentile sketch (and thus the raw p99)
    // shifts with partitioning; the clamped width must hold either way
    for (parts <- Seq(1, 7)) {
      val l = tailA.toDF("a_id", "a_s", "a_e").repartition(parts)
      val r = shortB.toDF("b_id", "b_s", "b_e").repartition(parts)
      val auto = Intervals
        .overlapJoin(l, col("a_s"), col("a_e"), r, col("b_s"), col("b_e"))
        .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
      assert(auto == explicit, s"parts=$parts")
    }
    // the guess-of-10 width really does trip the guard on this fixture —
    // the failure mode the auto default exists to avoid
    intercept[Exception] {
      Intervals.overlapJoin(
        tailA.toDF("a_id", "a_s", "a_e"), col("a_s"), col("a_e"),
        shortB.toDF("b_id", "b_s", "b_e"), col("b_s"), col("b_e"), binWidth = 10L)
        .collect()
    }
  }

  test("zero-length intervals (points) hit exactly their containing intervals") {
    val intervals = Seq((1L, 0L, 10L), (2L, 20L, 30L)).toDF("a_id", "a_s", "a_e")
    // points at: inside, left boundary, right boundary, bin boundary,
    // between intervals, far outside
    val points = Seq(
      (10L, 5L), (11L, 0L), (12L, 10L), (13L, 8L), (14L, 15L), (15L, 100L))
      .toDF("p_id", "p_s")
    val out = Intervals
      .overlapJoin(
        intervals, col("a_s"), col("a_e"),
        points, col("p_s"), col("p_s"), binWidth = 8L)
      .select("a_id", "p_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L)))
  }

  test("overlapJoin validates disjoint column names and binWidth") {
    val l = Seq((1L, 0L, 1L)).toDF("id", "s", "e")
    intercept[IllegalArgumentException] {
      Intervals.overlapJoin(l, col("s"), col("e"), l, col("s"), col("e"), 10L)
    }
    val r = Seq((2L, 0L, 1L)).toDF("id2", "s2", "e2")
    intercept[IllegalArgumentException] {
      Intervals.overlapJoin(l, col("s"), col("e"), r, col("s2"), col("e2"), 0L)
    }
  }

  test("auto bin width is layout-stable: same width from 1-file and 8-file layouts") {
    // long-tailed spans so the width decision is non-trivial; write the
    // SAME rows under two different physical layouts — scan order and
    // partition boundaries differ, the chosen width must not
    val rng = new scala.util.Random(41)
    val rows = (0 until 5000).map { i =>
      val span = if (i % 100 == 0) 5000L + rng.nextInt(5000) else 1L + rng.nextInt(64)
      (i.toLong, i.toLong * 3, i.toLong * 3 + span - 1)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-iv-layout").toString
    rows.toDF("id", "s", "e").coalesce(1).write.parquet(s"$dir/one")
    rows.toDF("id", "s", "e").repartition(8, col("id"))
      .write.parquet(s"$dir/eight")
    def width(path: String): Long = {
      val df = spark.read.parquet(path)
      Intervals.autoBinWidth(df, col("s"), col("e"), df, col("s"), col("e"))
    }
    val w1 = width(s"$dir/one")
    val w8 = width(s"$dir/eight")
    assert(w1 == w8)
    // and the width is sane: covers the common mass, clamped by the tail
    assert(w1 >= 64L && w1 <= 10000L)
  }
}
