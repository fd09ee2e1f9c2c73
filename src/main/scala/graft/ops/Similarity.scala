package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{array_cosine_similarity, array_distance, VectorKernels}
import graft.ivf.IndexStore

/** Similarity-search operators over embedding columns.
  *
  * Brute-force top-k is the correctness baseline; the scale paths bucket by
  * IVF cell (broadcast centroids, map-side assignment) so candidate
  * generation is a hash-join on cell id instead of an n² cross join.
  */
object Similarity {

  /** Brute-force cosine top-k: `orderBy(desc).limit(k)` →
    * TakeOrderedAndProject (per-partition bounded heap + driver merge).
    */
  def cosineTopK(df: DataFrame, vecCol: String, query: Seq[Float], k: Int): DataFrame = {
    val qlit = graft.functions.float_vector(query)
    df.orderBy(array_cosine_similarity(col(vecCol), qlit).desc_nulls_last).limit(k)
  }

  /** Brute-force k-NN join: every row of `queries` gets its k nearest
    * `corpus` rows by L2. The query side is broadcast (it is the small
    * side); the corpus streams. Output: query id, neighbor id, rank.
    */
  def knnJoin(
      queries: DataFrame,
      corpus: DataFrame,
      queryId: String,
      corpusId: String,
      vecCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(
      col(queryId).as("query_id"), col(vecCol).as("_qvec"))
    val joined = corpus
      .join(broadcast(q), col(corpusId) =!= col("query_id"))
      .withColumn("_dist", array_distance(col(vecCol), col("_qvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("_dist").asc, col(corpusId).asc)
    joined
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col(corpusId).as("neighbor_id"), col("rank"))
  }

  /** Map-side IVF cell assignment: adds a `_cell` column = nearest centroid
    * id, with the centroid matrix broadcast. The building block for
    * bucketed similarity joins and distributed ANN.
    */
  def withCell(
      spark: SparkSession,
      df: DataFrame,
      vecCol: String,
      centroids: Array[Float],
      dim: Int): DataFrame = {
    val bc = spark.sparkContext.broadcast(centroids)
    val cellUdf = udf { (v: Seq[Float]) =>
      if (v == null) -1 else VectorKernels.nearestCentroid(v.toArray, bc.value, dim)
    }
    df.withColumn("_cell", cellUdf(col(vecCol)))
  }

  /** Candidate pairs from shared IVF cells: both sides bucket by nearest
    * centroid (map-side), pairs come from an equi-join on `_cell` — the
    * 100 TB-safe alternative to a cross join. Recall is bounded by cell
    * co-location (multi-probe raises it; exact pairs near cell borders can
    * be missed — callers needing exact results use
    * [[Dedup.embeddingNearDupPairs]]).
    */
  def ivfCellPairs(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Float],
      dim: Int,
      threshold: Double): DataFrame = {
    val cells = withCell(spark, df, vecCol, centroids, dim)
      .select(col(idCol).as("id"), col(vecCol).as("v"), col("_cell"))
    cells.as("a")
      .join(cells.as("b"),
        col("a._cell") === col("b._cell") && col("a.id") < col("b.id"))
      .where(array_cosine_similarity(col("a.v"), col("b.v")) >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
  }
}
