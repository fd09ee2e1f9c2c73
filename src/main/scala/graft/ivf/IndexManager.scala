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

  def ensure(
      spark: SparkSession,
      path: String,
      column: String,
      nClusters: Option[Int] = None,
      store: IndexStore = IndexStore.default): TableIndex =
    cache.getOrElseUpdate((path, column), {
      val files = listFiles(spark, path)
      val existing = files.map(f => store.load(f, column))
      if (nClusters.isEmpty && existing.forall(_.isDefined)) {
        val first = existing.head.get
        TableIndex(path, column, first.dim, first.nClusters, files)
      } else {
        val result = IvfBuilder.build(
          spark, path, IvfBuilder.Config(column, nClusters), store)
        TableIndex(path, column, result.dim, result.nClusters, files)
      }
    })
}
