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
  * forward onto each left row. Cost is a single shuffle by key: no
  * range-join pair explosion, no broadcast requirement, skew bounded by
  * per-key row counts — the shape that survives a 100 TB event table.
  */
object AsOf {

  /** @param left  probe side; all its columns pass through.
    * @param right payload side; its non-key non-ts columns appear in the
    *              output as `asof_<name>` (null when no right row precedes).
    *              For deterministic results right (key, ts) pairs should be
    *              unique — pre-aggregate otherwise.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    val rPayload = right.columns.filterNot(c => keyCols.contains(c) || c == tsCol)
    require(rPayload.nonEmpty, "right side has no payload columns")
    val lPassthrough = left.columns.filterNot(c => keyCols.contains(c) || c == tsCol)

    val lSel =
      keyCols.map(col) ++ Seq(col(tsCol)) ++
        lPassthrough.map(col) ++
        Seq(lit(1).as("_side")) ++
        rPayload.map(c => lit(null).cast(right.schema(c).dataType).as(s"asof_$c"))
    val rSel =
      keyCols.map(col) ++ Seq(col(tsCol)) ++
        lPassthrough.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(lit(0).as("_side")) ++
        rPayload.map(c => col(c).as(s"asof_$c"))

    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rPayload.foldLeft(left.select(lSel: _*).unionByName(right.select(rSel: _*))) {
      (df, c) => df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    filled
      .where(col("_side") === 1)
      .drop("_side")
  }
}
