package graft.ivf

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Process-wide cache of built IVF indexes, keyed by (table path, column).
  * `ensure` builds with the reference's default parameters on first use and
  * reuses sidecars across sessions/runs (they are seeded-deterministic, so
  * reuse is safe).
  */
object IndexManager {

  final case class TableIndex(
      path: String,
      column: String,
      dim: Int,
      nClusters: Int,
      files: Seq[String])

  private val cache = TrieMap.empty[(String, String), TableIndex]

  /** Enumerate data files from the driver-side file index (no scan job);
    * canonical form matches `_metadata.file_path` and the store keys.
    */
  def listFiles(spark: SparkSession, path: String): Seq[String] =
    spark.read.parquet(path).inputFiles.toSeq
      .map(IndexStore.canonicalPath)
      .sorted

  /** Sidecar first, footer-embedded second (the order the driver peeks in);
    * shared by the executor-side probe paths.
    */
  def loadIndex(store: IndexStore, file: String, column: String): IvfIndex =
    store.load(file, column)
      .orElse(ParquetFooterIndex.load(file, column))
      .getOrElse(throw new IllegalStateException(
        s"no IVF index for file $file column '$column' — build one with IvfBuilder"))

  /** `ensure` + the table's shared centroid matrix (every per-file index
    * of a table carries the same centroids by construction, so the first
    * file's copy is authoritative) — the entry point for cell-bucketing
    * callers (sq2/cp-style cell joins, batch ANN).
    */
  def ensureWithCentroids(
      spark: SparkSession,
      path: String,
      column: String,
      store: IndexStore = IndexStore.default): (TableIndex, Array[Float]) = {
    val ti = ensure(spark, path, column, store = store)
    (ti, loadIndex(store, ti.files.head, column).centroids)
  }

  def ensure(
      spark: SparkSession,
      path: String,
      column: String,
      nClusters: Option[Int] = None,
      store: IndexStore = IndexStore.default): TableIndex =
    cache.getOrElseUpdate((path, column), {
      val files = listFiles(spark, path)
      // header peeks only — O(files) tiny reads, no posting-list decode
      val peeks = files.map(f => store.peek(f, column))
      if (nClusters.isEmpty && peeks.forall(_.isDefined)) {
        val (dim, k) = peeks.head.get
        TableIndex(path, column, dim, k, files)
      } else if (nClusters.isEmpty && peeks.exists(_.isDefined)) {
        // append-only table grew: index just the new files, shared centroids
        val result = IvfBuilder.extend(spark, path, IvfBuilder.Config(column), store)
        TableIndex(path, column, result.dim, result.nClusters, files)
      } else {
        val result = IvfBuilder.build(
          spark, path, IvfBuilder.Config(column, nClusters), store)
        TableIndex(path, column, result.dim, result.nClusters, files)
      }
    })
}
