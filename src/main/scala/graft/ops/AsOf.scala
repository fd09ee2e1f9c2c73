package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — each left row is matched to the LATEST
  * right row with `right.ts <= left.ts` for the same key, the time-series
  * join Spark has no built-in for (and the kind of custom operator the
  * engine composes from primitives rather than hand-scheduling).
  *
  * Implemented as union + ONE keyed window pass: both sides union into a
  * single stream sorted by (ts, side) per key — right rows first on ties so
  * an equal-timestamp right row is visible — and `last(_, ignoreNulls)`
  * over an unbounded-preceding frame carries the most recent right payload
  * forward onto each left row. The payload travels as ONE struct of all
  * right columns (null struct on left rows), so every `asof_*` value comes
  * from the SAME matched right row — per-column carry would stitch values
  * from different rows whenever the payload itself contains nulls. Cost is
  * a single shuffle by key: no range-join pair explosion, no broadcast
  * requirement, skew bounded by per-key row counts — the shape that
  * survives a 100 TB event table.
  */
object AsOf {

  /** @param left  probe side; all its columns pass through.
    * @param right payload side; its non-key non-ts columns appear in the
    *              output as `asof_<name>` (null when no right row precedes).
    *              For deterministic results right (key, ts) pairs should be
    *              unique — pre-aggregate otherwise.
    * @param direction `"backward"` (default): latest right with
    *              `right.ts <= left.ts` — the classic point-in-time
    *              lookup. `"forward"`: EARLIEST right with
    *              `right.ts >= left.ts` — "next event after" semantics
    *              (time-to-conversion, next-maintenance lookups). Same
    *              single keyed window pass, traversed in the opposite
    *              time order; equal timestamps match in both directions.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      direction: String = "backward"): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(
      direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward', got '$direction'")
    require(
      !left.columns.contains("_side") && !left.columns.contains("_payload"),
      "left side may not contain the reserved columns '_side' / '_payload'")
    val rPayload = right.columns.filterNot(c => keyCols.contains(c) || c == tsCol)
    require(rPayload.nonEmpty, "right side has no payload columns")
    val lPassthrough = left.columns.filterNot(c => keyCols.contains(c) || c == tsCol)

    val payloadType = org.apache.spark.sql.types.StructType(
      rPayload.map(c => right.schema(c).copy(name = c)))
    val lSel =
      keyCols.map(col) ++ Seq(col(tsCol)) ++
        lPassthrough.map(col) ++
        Seq(lit(1).as("_side"), lit(null).cast(payloadType).as("_payload"))
    val rSel =
      keyCols.map(col) ++ Seq(col(tsCol)) ++
        lPassthrough.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(lit(0).as("_side"), struct(rPayload.map(col): _*).as("_payload"))

    // null-timestamp policy (review r11): a right row with a null ts has no
    // position on the time axis and must never match — under the old plain
    // asc order it sorted FIRST and was carried as the "latest" payload
    // into every left row preceding the first real right event. A left row
    // with a null ts gets a null payload in BOTH directions (nulls-first in
    // each traversal order — plain desc would have put them LAST and
    // matched them to the earliest right row on the forward path).
    val tsOrder =
      if (direction == "backward") col(tsCol).asc_nulls_first
      else col(tsCol).desc_nulls_first
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(tsOrder, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    left.select(lSel: _*)
      .unionByName(right.where(col(tsCol).isNotNull).select(rSel: _*))
      .withColumn("_payload", last(col("_payload"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(
        keyCols.map(col) ++ Seq(col(tsCol)) ++ lPassthrough.map(col) ++
          rPayload.map(c => col(s"_payload.$c").as(s"asof_$c")): _*)
  }
}
