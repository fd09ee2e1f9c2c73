package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{array_cosine_similarity, array_distance}

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
    * id via the codegen'd [[graft.functions.NearestCentroid]] expression
    * (the centroid matrix ships inside the broadcast task binary). The
    * building block for bucketed similarity joins and distributed ANN.
    * Null/mismatched vectors get cell -1.
    */
  def withCell(
      df: DataFrame,
      vecCol: String,
      centroids: Array[Float],
      dim: Int): DataFrame =
    df.withColumn(
      "_cell",
      coalesce(graft.functions.nearest_centroid(col(vecCol), centroids, dim), lit(-1)))

  /** Candidate pairs from shared IVF cells: both sides bucket by nearest
    * centroid (map-side), pairs come from an equi-join on cell id — the
    * 100 TB-safe alternative to a cross join. Precision is exact (every
    * emitted pair passes the cosine threshold); recall is bounded by cell
    * co-location. `probes > 1` assigns each probe-side vector to its p
    * nearest cells, so a pair is found whenever either vector's home cell is
    * among the other's p probes — the same recall/fan-out trade as `nprobe`
    * on the IVF search path. Callers needing exact results use
    * [[Dedup.embeddingNearDupPairs]].
    */
  def ivfCellPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Float],
      dim: Int,
      threshold: Double,
      probes: Int = 1): DataFrame = {
    val cells = withCell(df, vecCol, centroids, dim)
      .select(col(idCol).as("id"), col(vecCol).as("v"), col("_cell"))
    if (probes <= 1) {
      cells.as("a")
        .join(cells.as("b"),
          col("a._cell") === col("b._cell") && col("a.id") < col("b.id"))
        .where(array_cosine_similarity(col("a.v"), col("b.v")) >= threshold)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    } else {
      val probed = df.select(
        col(idCol).as("id"),
        col(vecCol).as("v"),
        explode(graft.functions.nearest_centroids(col(vecCol), centroids, dim, probes))
          .as("_pcell"))
      // probe side × home side; both orientations of a pair can appear, so
      // verify (cosine is symmetric), normalize to (min id, max id), dedup
      probed.as("a")
        .join(cells.as("b"),
          col("a._pcell") === col("b._cell") && col("a.id") =!= col("b.id"))
        .where(array_cosine_similarity(col("a.v"), col("b.v")) >= threshold)
        .select(
          least(col("a.id"), col("b.id")).as("id_a"),
          greatest(col("a.id"), col("b.id")).as("id_b"))
        .distinct()
    }
  }
}
