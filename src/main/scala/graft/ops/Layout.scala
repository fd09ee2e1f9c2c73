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
  /** Drop a managed table AND its warehouse-dir files: the files outlive
    * the in-memory catalog (fresh session, same warehouse dir), and CREATE
    * refuses a stale location. One shared implementation for every
    * managed-table writer (was duplicated verbatim in the lexical
    * artifact writer — review r11).
    */
  /** Smallest multiple of `numBuckets` that is ≥ the session's default
    * parallelism — the bucket-aligned write width (see [[writeBucketed]]).
    */
  private[ops] def alignedPartitions(df: DataFrame, numBuckets: Int): Int = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    numBuckets * math.max(1, (p + numBuckets - 1) / numBuckets)
  }

  private[ops] def dropManagedTable(
      spark: org.apache.spark.sql.SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog
        .defaultTablePath(org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(loc)) fs.delete(loc, true): Unit
  }

  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    val sorts = if (sortCols.isEmpty) Seq(key) else sortCols
    val spark = df.sparkSession
    dropManagedTable(spark, table)
    // bucket-ALIGNED repartition before the write (r14, guide §6): a
    // bucketed V1 write splits every task's rows across all `numBuckets`
    // files, so an unaligned upstream (e.g. a 32-partition aggregate)
    // writes up to tasks×buckets tiny files — paid again by every later
    // scan. Hash-repartitioning on the bucket key into any MULTIPLE m of
    // numBuckets aligns tasks to buckets (bucket id = pmod(hash, B) =
    // partition id mod B, same Murmur3), so each task holds exactly one
    // bucket → exactly m output files. m = smallest multiple of
    // numBuckets ≥ the cluster's default parallelism, so the write keeps
    // its parallelism when buckets < cores (the local-mode shape) and
    // degenerates to one file per bucket when buckets ≥ cores (the
    // production shape, where bucket count is the corpus-level knob).
    df.repartition(alignedPartitions(df, numBuckets), col(key))
      .write
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

  /** Rewrite an embedding table physically GROUPED BY IVF CELL: assign
    * each row to its nearest centroid, range-shuffle on the cell id so
    * each output file holds a contiguous cell span, and sort by cell
    * within files — then drop the helper column. This is the layout that
    * makes candidate-proportional index IO real: a probe's posting lists
    * become contiguous page runs instead of row ordinals scattered across
    * every page of every file. The round-6 scale probe measured the
    * difference at 500k × 256: SQ8/PQ search 3.0 s on write-order layout
    * vs 0.26 s cell-grouped — pruned candidate COUNTS only convert to
    * pruned IO when rows are physically grouped by cell. At 100 TB this
    * write-once shuffle is the difference between the index working and
    * not working. Rebuild the index AFTER relayout (row ordinals change):
    * `IvfBuilder.build(spark, outPath, Config(column), store)` — pass the
    * same `centroids` as `warmStart` to keep the cell geometry.
    *
    * `pageRows` caps rows per parquet PAGE (the selective-fetch read
    * granule): the refine phase fetches k·oversample SCATTERED survivors,
    * and at default pages (~1 MiB ≈ 256 rows at dim=1024) each survivor
    * drags a whole page — the round-10 TierIoProbe measured this page
    * amplification at ~100 MB/query, drowning the quantized tiers' 4-32×
    * coarse byte savings. `Some(1)` is the reference's 1-row-page pairing
    * ([[graft.ivf.IvfBuilder.rewriteWithIndex]], reference
    * `src/ivf/build.rs` write_props): point reads become row-exact at the
    * cost of per-page headers (~1-2% at 4 KiB rows) and a larger offset
    * index. `None` keeps the writer defaults (right for scan-dominated
    * tables). Dictionary encoding is disabled alongside a cap — float
    * vectors don't dictionary-compress, and page-exact selection must not
    * pay a per-row-group dictionary page read.
    * Returns the reread frame.
    */
  def writeByCell(
      df: DataFrame,
      outPath: String,
      column: String,
      centroids: Array[Float],
      dim: Int,
      numFiles: Int,
      pageRows: Option[Int] = None): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    require(pageRows.forall(_ >= 1), s"pageRows must be >= 1, got $pageRows")
    require(
      centroids.nonEmpty && centroids.length % dim == 0,
      s"centroid matrix length ${centroids.length} not a positive multiple of dim $dim")
    val spark = df.sparkSession
    // the codegen'd kernel expression, not a Scala UDF: a 100 TB relayout
    // evaluates this once per row, and the UDF form paid Seq[Float] boxing
    // + a defensive copy per row (review r11). NULL (null/odd-dim vector)
    // maps to cell -1 — the engine-wide unassignable convention
    val assign = org.apache.spark.sql.functions.coalesce(
      graft.functions.nearest_centroid(col(column).cast("array<float>"), centroids, dim),
      org.apache.spark.sql.functions.lit(-1))
    // collision-proof helper name: a user column literally named "_cell"
    // (our own similarity ops emit one) must survive the round trip intact
    val cellCol = s"_graft_cell_${java.util.UUID.randomUUID().toString.take(8)}"
    val writer = df.withColumn(cellCol, assign)
      .repartitionByRange(numFiles, col(cellCol))
      .sortWithinPartitions(cellCol)
      .drop(cellCol)
      .write
      .mode("overwrite")
    pageRows
      .fold(writer)(n => writer
        .option("parquet.page.row.count.limit", n.toString)
        .option("parquet.enable.dictionary", "false"))
      .parquet(outPath)
    spark.read.parquet(outPath)
  }

  /** Write `df` Z-ORDERED on `cols`: each layout column is ranked into
    * `2^bits` equi-depth buckets (quantile boundaries from ONE
    * `percentile_approx` aggregate — equi-depth, so skewed columns still
    * spread over the full bucket range), the per-column bucket ranks are
    * Morton-interleaved MSB-first into a single long, and rows
    * range-shuffle + sort on that code. Every output file (and row group)
    * then spans a narrow HYPER-RECTANGLE of the key space instead of a
    * narrow slice of one column — range predicates on ANY subset of
    * `cols` prune row groups via footer min/max stats, where
    * [[writeSortedBy]] only prunes on its leading column. This is the
    * multi-dimensional twin of [[writeSortedBy]] (the Delta/Iceberg
    * OPTIMIZE ZORDER layout) and, like it, a write-once shuffle: one
    * quantile aggregate + one range exchange, no driver loop, no
    * collect beyond the O(cols × 2^bits) boundary array. Rank lookup is
    * the codegen'd [[graft.functions.sorted_rank]] kernel — an O(log 2^bits)
    * binary search per row per column inside whole-stage codegen (the HOF
    * `size(filter(bounds, b <= v))` form ran interpreted and allocated a
    * filtered array per row — review r11). Nulls rank 0 (sort first, like
    * SQL NULLS FIRST). Returns the reread frame.
    */
  def writeZOrder(
      df: DataFrame,
      path: String,
      cols: Seq[String],
      numFiles: Int,
      bits: Int = 8): DataFrame = {
    import org.apache.spark.sql.functions._
    require(cols.size >= 2, s"z-order needs >= 2 columns, got ${cols.size}")
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    require(bits >= 1 && cols.size * bits <= 62,
      s"need 1 <= bits and cols*bits <= 62, got ${cols.size} x $bits")
    val buckets = 1 << bits
    // one pass: equi-depth boundaries for every layout column at once
    val pcts = typedLit((1 until buckets).map(_.toDouble / buckets))
    val boundsRow = df
      .select(cols.map(c =>
        percentile_approx(col(c).cast("double"), pcts, lit(10000)).as(c)): _*)
      .head()
    val zcol = s"_graft_z_${java.util.UUID.randomUUID().toString.take(8)}"
    val code: Column = cols.zipWithIndex.map { case (c, ci) =>
      val bounds = Option(boundsRow.getSeq[Double](ci)).getOrElse(Seq.empty)
      // rank = #boundaries <= v, in [0, buckets-1]; null → 0 (sort first)
      val rank = coalesce(
        graft.functions.sorted_rank(col(c), bounds.toArray), lit(0)).cast("long")
      // spread rank's bits MSB-first into every cols.size-th output bit
      (0 until bits).map { i =>
        val srcBit = bits - 1 - i                       // MSB first
        val dstBit = cols.size * bits - 1 - (i * cols.size + ci)
        shiftleft(shiftright(rank, srcBit).bitwiseAND(lit(1L)), dstBit)
      }.reduce(_.bitwiseOR(_))
    }.reduce(_.bitwiseOR(_))
    df.withColumn(zcol, code)
      .repartitionByRange(numFiles, col(zcol))
      .sortWithinPartitions(zcol)
      .drop(zcol)
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
