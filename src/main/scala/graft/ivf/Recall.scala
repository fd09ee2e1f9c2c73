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

  /** Recall@k of the ANGULAR (cosine) index path — the winner-first feed
    * the SQL rewrite serves `ORDER BY array_cosine_similarity DESC LIMIT k`
    * from — vs the brute cosine top-k. vq8 gates this path's EXACTNESS at
    * exhaustive probe; this tracks its quality on the recall curve at a
    * production nprobe.
    */
  def cosineAtK(
      spark: SparkSession,
      path: String,
      column: String,
      idCol: String,
      query: Seq[Float],
      k: Int,
      nprobe: Int,
      store: IndexStore = IndexStore.default): Result = {
    import org.apache.spark.sql.functions.broadcast
    val exact = spark.read.parquet(path)
      .orderBy(
        graft.functions
          .array_cosine_similarity(col(column), graft.functions.float_vector(query))
          .desc_nulls_last)
      .limit(k)
      .select(col(idCol)).collect().map(_.getLong(0)).toSet
    val files = IndexManager.listFiles(spark, path)
    val winners = VectorTopK
      .searchByFiles(
        spark, files, column, query, VectorTopK.Options(nprobe = nprobe), store,
        cosine = true)
      .orderBy(col("_dist").asc_nulls_last) // 1 − cos ascending = cos descending
      .limit(k)
      .select(col("_file"), col("_ri"))
    val approx = spark.read.parquet(path)
      .withColumn("_file", col("_metadata.file_path"))
      .withColumn("_ri", col("_metadata.row_index"))
      .join(broadcast(winners), Seq("_file", "_ri"), "left_semi")
      .select(col(idCol)).collect().map(_.getLong(0)).toSet
    val candidates = files.flatMap { f =>
      store.load(f, column).orElse(ParquetFooterIndex.load(f, column))
        .map(_.candidateRowsCosine(query.toArray, nprobe).length.toLong)
    }.sum
    Result(k, nprobe, (exact & approx).size.toDouble / k, candidates)
  }
}
