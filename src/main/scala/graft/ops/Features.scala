package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature-engineering operators over event tables — the
  * sequence-context features a behavioral model trains on, computed in
  * keyed window passes (shuffle on the key, per-partition streaming
  * sort; no global ordering anywhere).
  */
object Features {

  /** Per-key sequence features: `seq` (1-based rank in `(tsCol, idCol)`
    * order), `gap_us` (microseconds since the key's previous event; null
    * for the first), and `rolling_n` (events of this key in the last
    * `windowUs` microseconds INCLUDING this one — a range-frame count,
    * so bursts score high regardless of their row count). One hash
    * shuffle on `keyCol` shared by all three windows (same partitioning
    * + compatible ordering). `tsCol` must be a timestamp; ties break on
    * `idCol` for the rank/lag features, while the range frame is
    * time-based (ties share the frame — the SQL RANGE semantics both
    * engines implement identically).
    */
  def lagFeatures(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      idCol: Column,
      windowUs: Long): DataFrame = {
    require(windowUs >= 0, s"windowUs must be >= 0, got $windowUs")
    // withColumn would silently OVERWRITE a same-named input column
    val clash = df.columns.toSet.intersect(Set("seq", "gap_us", "rolling_n"))
    require(clash.isEmpty,
      s"lagFeatures: input already has output column(s) ${clash.mkString(", ")} — rename first")
    val us = unix_micros(tsCol.cast("timestamp"))
    val ordered = Window.partitionBy(keyCol).orderBy(us, idCol)
    val ranged = Window.partitionBy(keyCol).orderBy(us)
      .rangeBetween(-windowUs, Window.currentRow)
    df.withColumn("seq", row_number().over(ordered))
      .withColumn("gap_us", us - lag(us, 1).over(ordered))
      .withColumn("rolling_n", count(lit(1)).over(ranged).cast("bigint"))
  }
}
