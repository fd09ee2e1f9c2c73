package graft.ivf

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{array_distance, float_vector}

/** Top-k vector search: brute-force and IVF-index-accelerated paths.
  *
  * Mirrors the reference's `TopkBuilder` / `VectorTopKExec` pipeline
  * (`/root/reference/src/ivf/search.rs:47-142`, `src/df_vector/exec.rs`)
  * as a Spark plan:
  *
  *  - brute force = `orderBy(array_distance).limit(k)` — Spark plans this as
  *    `TakeOrderedAndProjectExec`, a per-partition bounded heap + driver
  *    merge, i.e. exactly the reference's heap re-rank, but distributed;
  *  - indexed = driver-side probe of the (small) per-file indexes → a
  *    broadcast semi-join of the candidate (file, row ordinal) pairs against
  *    the scan → residual filter → heap top-k. Candidate pruning composes
  *    with later filters in post-filter order, matching the reference's
  *    semantics (`src/df_vector/tests.rs:151-241`): a restrictive filter may
  *    return fewer than k rows.
  *
  * Scale: the index per file is ~(k·d·4 + rows·4) bytes, so probing stays on
  * the driver; only the candidate id pairs (≈ nprobe/nClusters of all rows)
  * are broadcast. File pruning happens via the `_metadata.file_path` filter;
  * within a file, Spark reads at row-group granularity (the reference gets
  * page-granular reads via 1-row pages, `src/ivf/parquet.rs:324-345` — a
  * perf, not correctness, delta noted in SURVEY §4.2).
  */
object VectorTopK {

  /** Reference defaults: `/root/reference/src/df_vector/options.rs:3-19`. */
  final case class Options(nprobe: Int = 5, maxCandidates: Option[Int] = None) {
    require(nprobe > 0, "nprobe must be > 0")
    maxCandidates.foreach(m => require(m > 0, "max_candidates must be > 0"))
  }

  def distanceCol(column: String, query: Seq[Float]): Column =
    array_distance(col(column), float_vector(query))

  /** Exact brute-force top-k; `NULLS LAST` reproduces the reference's
    * skip-null/skip-mismatched-dim semantics under `LIMIT k`.
    */
  def bruteForce(df: DataFrame, column: String, query: Seq[Float], k: Int): DataFrame =
    df.orderBy(distanceCol(column, query).asc_nulls_last).limit(k)

  /** Round-robin fairness cap across files so one file cannot starve the
    * others (reference `CandidateCursor`: `src/df_vector/access.rs:193-243`).
    */
  def capRoundRobin(
      perFile: Seq[(String, Array[Int])], cap: Int): Seq[(String, Array[Int])] = {
    val cursors = perFile.map(_ => 0).toArray
    val out = perFile.map(_ => Vector.newBuilder[Int]).toArray
    var taken = 0
    var progressed = true
    while (taken < cap && progressed) {
      progressed = false
      var i = 0
      while (i < perFile.length && taken < cap) {
        val (_, cands) = perFile(i)
        if (cursors(i) < cands.length) {
          out(i) += cands(cursors(i))
          cursors(i) += 1
          taken += 1
          progressed = true
        }
        i += 1
      }
    }
    perFile.zipWithIndex.map { case ((file, _), i) => (file, out(i).result().toArray) }
  }

  /** Index-accelerated top-k over a Parquet table.
    *
    * @param filter residual predicate applied AFTER candidate pruning
    *               (post-filter semantics, like the reference).
    */
  def indexed(
      spark: SparkSession,
      path: String,
      column: String,
      query: Seq[Float],
      k: Int,
      options: Options = Options(),
      filter: Option[Column] = None,
      store: IndexStore = IndexStore.default): DataFrame = {
    require(k > 0, "k must be > 0")
    import spark.implicits._

    val base = spark.read.parquet(path)
    val files = IndexManager.listFiles(spark, path)
    val q = query.toArray

    val perFile: Seq[(String, Array[Int])] = files.toSeq.map { file =>
      val index = store
        .load(file, column)
        .orElse(ParquetFooterIndex.load(file, column))
        .getOrElse(throw new IllegalStateException(
          s"no IVF index for file $file column '$column' — build one with IvfBuilder"))
      require(
        index.dim == q.length,
        s"query dim ${q.length} != index dim ${index.dim} for $file")
      (file, index.candidateRows(q, options.nprobe))
    }

    val capped = options.maxCandidates match {
      case Some(cap) => capRoundRobin(perFile, cap)
      case None => perFile
    }
    val nonEmpty = capped.filter(_._2.nonEmpty)
    // metered custom scan node (files_scanned / candidate_rows SQLMetrics)
    graft.Graft.installStrategy(spark)
    val candDf = graft.plans.IvfCandidateScan
      .df(spark, column, q.length, options.nprobe, nonEmpty)
      .toDF("_file", "_ri")
    val filesWithCands = nonEmpty.map(_._1)

    val scan = base
      .withColumn("_file", col("_metadata.file_path"))
      .withColumn("_ri", col("_metadata.row_index"))
      .where(col("_file").isin(filesWithCands: _*))
      .join(broadcast(candDf), Seq("_file", "_ri"), "left_semi")
      .drop("_file", "_ri")

    val filtered = filter.fold(scan)(scan.where)
    bruteForce(filtered, column, query.toIndexedSeq, k)
  }
}
