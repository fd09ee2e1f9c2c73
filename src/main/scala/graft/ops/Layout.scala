package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Data-layout operators: physical organization that trades one write-time
  * shuffle for shuffle-free reads forever after — the dominant cost lever
  * for repeat joins/aggregations over cluster-sized tables (a 100 TB fact
  * table that is joined on the same key daily should never re-exchange).
  */
object Layout {

  /** Write `df` as a bucketed (and per-bucket sorted) managed parquet
    * table: rows hash-partition on `key` into `numBuckets` files per write
    * task, and the catalog records the layout, so later equi-joins and
    * aggregations on `key` between same-bucketed tables plan with NO
    * shuffle exchange (and, with matching `sortBy`, no sort) under
    * `spark.sql.sources.bucketing.enabled`. Bucket count is a corpus-level
    * choice: targets per-bucket data that fits an executor's memory at
    * full scale.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val sorts = if (sortCols.isEmpty) Seq(key) else sortCols
    // a managed table's files outlive the in-memory catalog (fresh session,
    // same warehouse dir), and CREATE refuses a stale location — drop both
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog
        .defaultTablePath(org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(loc)) fs.delete(loc, true): Unit
    df.write
      .format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(sorts.head, sorts.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Write `df` range-partitioned + sorted on `cols`: rows range-shuffle
    * into `numFiles` contiguous key ranges and sort within each, so every
    * parquet row group's min/max stats span a narrow slice of the key
    * space — range predicates on `cols` then prune most row groups at
    * scan time (zone-map skipping, free from pushed filters + footer
    * stats). The write-once twin of [[writeBucketed]]: bucketing kills the
    * JOIN shuffle, range-sorting kills the SELECTIVE-SCAN read. Returns
    * the reread frame.
    */
  def writeSortedBy(
      df: DataFrame,
      path: String,
      cols: Seq[String],
      numFiles: Int): DataFrame = {
    require(cols.nonEmpty, "need at least one layout column")
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val keys: Seq[Column] = cols.map(col)
    df.repartitionByRange(numFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write
      .mode("overwrite")
      .parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Compact a parquet directory's small files into ~`targetFileBytes`
    * outputs — the small-files mitigation every long-running ingest needs
    * (each file costs a task + footer read + catalog entry per downstream
    * scan; a stream or per-batch writer left alone produces millions).
    * File count is sized from the INPUT's on-disk bytes, and the shuffle
    * is a round-robin repartition (no key skew; parallel writers).
    * Returns the reread compacted frame.
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      inPath: String,
      outPath: String,
      targetFileBytes: Long = 128L << 20): DataFrame = {
    require(targetFileBytes > 0, "targetFileBytes must be > 0")
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val bytes = fs.getContentSummary(p).getLength
    val numFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inPath)
      .repartition(numFiles)
      .write
      .mode("overwrite")
      .parquet(outPath)
    spark.read.parquet(outPath)
  }
}
