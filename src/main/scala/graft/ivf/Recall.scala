package graft.ivf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Recall@k harness — the reference's benchmark quality metric
  * (`/root/reference/benches/query.rs:562-569`):
  * `|indexed ∩ exact| / k` for an ANN configuration vs brute force.
  */
object Recall {

  final case class Result(k: Int, nprobe: Int, recall: Double, candidates: Long)

  def atK(
      spark: SparkSession,
      path: String,
      column: String,
      idCol: String,
      query: Seq[Float],
      k: Int,
      nprobe: Int,
      store: IndexStore = IndexStore.default): Result = {
    val exact = VectorTopK
      .bruteForce(spark.read.parquet(path), column, query, k)
      .select(col(idCol)).collect().map(_.getLong(0)).toSet
    val indexedDf = VectorTopK.indexed(
      spark, path, column, query, k, VectorTopK.Options(nprobe = nprobe), store = store)
    val approx = indexedDf.select(col(idCol)).collect().map(_.getLong(0)).toSet
    val files = IndexManager.listFiles(spark, path)
    val candidates = files.flatMap { f =>
      store.load(f, column).orElse(ParquetFooterIndex.load(f, column))
        .map(_.candidateRows(query.toArray, nprobe).length.toLong)
    }.sum
    Result(k, nprobe, (exact & approx).size.toDouble / k, candidates)
  }
}
