package graft.ops

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin attaches the latest preceding right row per key") {
    val left = Seq(
      (1L, 100L, 10L), // key 1, ts 100
      (1L, 250L, 11L),
      (2L, 50L, 20L),
      (3L, 10L, 30L) // key with no right rows at all
    ).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, 90L, "a"),
      (1L, 100L, "b"), // equal ts is visible (>= semantics)
      (1L, 200L, "c"),
      (2L, 60L, "d") // after the only left row → no match
    ).toDF("k", "ts", "payload")
    val out = AsOf.asofJoin(left, right, Seq("k"), "ts")
      .select(col("lid"), col("asof_payload"))
      .as[(Long, Option[String])].collect().toMap
    assert(out(10L) == Some("b")) // ts 100: equal-ts right row wins over ts 90
    assert(out(11L) == Some("c")) // latest of {90, 100, 200} <= 250
    assert(out(20L) == None) // only right row is later
    assert(out(30L) == None) // key absent on the right
  }

  test("asofJoin forward direction attaches the earliest following right row") {
    val left = Seq(
      (1L, 100L, 10L),
      (1L, 250L, 11L),
      (2L, 70L, 20L)).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, 90L, "a"),   // before both left rows → never matches forward
      (1L, 100L, "b"),  // equal ts matches (>= semantics)
      (1L, 200L, "c"),
      (2L, 60L, "d")).toDF("k", "ts", "payload")
    val out = AsOf.asofJoin(left, right, Seq("k"), "ts", direction = "forward")
      .select(col("lid"), col("asof_payload"))
      .as[(Long, Option[String])].collect().toMap
    assert(out(10L) == Some("b")) // earliest of {100, 200} >= 100
    assert(out(11L) == None)      // nothing at-or-after 250
    assert(out(20L) == None)      // key 2's only right row precedes
    intercept[IllegalArgumentException](
      AsOf.asofJoin(left, right, Seq("k"), "ts", direction = "nearest"))
  }

  test("asofJoin takes ALL payload values from the matched row, nulls included") {
    // the latest right row carries a NULL in one payload column: per-column
    // carry would stitch the stale non-null 'a' from ts=100 with 'b' from
    // ts=200 — as-of semantics (and the DuckDB oracle) return the matched
    // row as-is, null and all
    val left = Seq((1L, 250L, 99L)).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, 100L, Option("x1"), Option(1)),
      (1L, 200L, Option.empty[String], Option(2))
    ).toDF("k", "ts", "a", "b")
    val out = AsOf.asofJoin(left, right, Seq("k"), "ts").collect().head
    assert(out.isNullAt(out.fieldIndex("asof_a")), "null from the matched row must survive")
    assert(out.getAs[Int]("asof_b") == 2)
  }

  test("null timestamps never match: right rows are ignored, left rows get null") {
    val left = Seq(
      (1L, Some(50L), 10L), // before every right row
      (1L, None, 11L)       // no position on the time axis
    ).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, Option.empty[Long], "phantom"), // used to be carried as "latest"
      (1L, Some(100L), "real")
    ).toDF("k", "ts", "payload")
    for (dir <- Seq("backward", "forward")) {
      val out = AsOf.asofJoin(left, right, Seq("k"), "ts", direction = dir)
        .select(col("lid"), col("asof_payload"))
        .as[(Long, Option[String])].collect().toMap
      assert(out(11L) == None, s"$dir: null-ts left row must not match")
      val expect10 = if (dir == "backward") None else Some("real")
      assert(out(10L) == expect10, s"$dir: ts=50 row")
    }
    // reserved-name collision fails fast
    intercept[IllegalArgumentException](
      AsOf.asofJoin(left.withColumn("_side", col("lid")), right, Seq("k"), "ts"))
  }

  test("asofJoin passes left columns through and nulls unmatched payloads") {
    val left = Seq((1L, 5L, "x", 1.5)).toDF("k", "ts", "tag", "v")
    val right = Seq((9L, 1L, 7)).toDF("k", "ts", "rv")
    val out = AsOf.asofJoin(left, right, Seq("k"), "ts").collect().head
    assert(out.getAs[String]("tag") == "x")
    assert(out.getAs[Double]("v") == 1.5)
    assert(out.isNullAt(out.fieldIndex("asof_rv")))
  }
}
