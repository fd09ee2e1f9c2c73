package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
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

  /** One scored neighbor candidate; ranked by (dist, id) ascending. */
  final case class Neighbor(neighbor_id: Long, dist: Float)

  /** Bounded top-k-per-key heap as a typed Aggregator: partial aggregation
    * runs MAP-SIDE, so the per-query shuffle carries at most k neighbors
    * per partition instead of the whole expanded candidate set — the
    * per-query-heap shape `TakeOrderedAndProject` uses globally, applied
    * per key.
    */
  final class TopKNeighbors(k: Int)
      extends Aggregator[(Long, Neighbor), Seq[Neighbor], Seq[Neighbor]] {
    private def key(n: Neighbor): (Float, Long) = (n.dist, n.neighbor_id)
    override def zero: Seq[Neighbor] = Vector.empty
    override def reduce(buf: Seq[Neighbor], in: (Long, Neighbor)): Seq[Neighbor] = {
      val n = in._2
      if (buf.length < k) (buf :+ n).sortBy(key)
      else if (Ordering[(Float, Long)].lt(key(n), key(buf.last))) {
        (buf.init :+ n).sortBy(key)
      } else buf
    }
    override def merge(a: Seq[Neighbor], b: Seq[Neighbor]): Seq[Neighbor] =
      (a ++ b).sortBy(key).take(k)
    override def finish(r: Seq[Neighbor]): Seq[Neighbor] = r.sortBy(key)
    override def bufferEncoder: Encoder[Seq[Neighbor]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Neighbor]] = ExpressionEncoder()
  }

  /** Brute-force k-NN join: every row of `queries` gets its k nearest
    * `corpus` rows by L2. The query side is broadcast (it is the small
    * side); the corpus streams, and each task heaps its own slice per query
    * ([[TopKNeighbors]]) so the shuffle is queries × k rows — NOT the
    * queries × corpus expansion a ranking window would shuffle. Unscorable
    * pairs (null/dim-mismatched vectors) are skipped. Output: query id,
    * neighbor id, rank.
    *
    * Ids must be integral (byte/short/int/long): the per-key heap is keyed
    * by long, and a silent cast would null out e.g. string doc ids — so
    * non-integral id columns are rejected up front.
    */
  def knnJoin(
      queries: DataFrame,
      corpus: DataFrame,
      queryId: String,
      corpusId: String,
      vecCol: String,
      k: Int): DataFrame = {
    requireIntegral(queries, queryId)
    requireIntegral(corpus, corpusId)
    val q = queries.select(
      col(queryId).as("query_id"), col(vecCol).as("_qvec"))
    val scored = corpus
      .join(broadcast(q), col(corpusId) =!= col("query_id"))
      .select(
        col("query_id").cast("long"),
        col(corpusId).cast("long").as("neighbor_id"),
        array_distance(col(vecCol), col("_qvec")).as("dist"))
    topKRanked(scored, k)
  }

  /** IVF-accelerated k-NN join (batch ANN): each query row probes its
    * `probes` nearest cells and scores ONLY the corpus rows homed there —
    * per-query work scales with probed-cell volume (≈ probes/nClusters of
    * the corpus), never corpus size, and neither side is broadcast: the
    * candidate generation is an equi-join on cell id, so both sides
    * shuffle-partition by cell. With `probes >= nClusters` every cell is
    * probed and the result is EXACT (equals [[knnJoin]] — how va2 is
    * oracled); below that, recall follows the IVF probe curve. The
    * per-query heap keeps the post-join shuffle at queries × k rows.
    */
  def ivfKnnJoin(
      queries: DataFrame,
      corpus: DataFrame,
      queryId: String,
      corpusId: String,
      vecCol: String,
      centroids: Array[Float],
      dim: Int,
      k: Int,
      probes: Int): DataFrame = {
    require(probes >= 1, s"probes must be >= 1, got $probes")
    requireIntegral(queries, queryId)
    requireIntegral(corpus, corpusId)
    val corpusCells = withCell(corpus, vecCol, centroids, dim)
      .select(
        col(corpusId).cast("long").as("neighbor_id"),
        col(vecCol).as("_cvec"),
        col("_cell"))
    val probed = queries.select(
      col(queryId).cast("long").as("query_id"),
      col(vecCol).as("_qvec"),
      explode(
        graft.functions.nearest_centroids(col(vecCol), centroids, dim, probes))
        .as("_pcell"))
    // a corpus row lives in exactly one cell and probe cells are distinct,
    // so a (query, corpus) pair is scored at most once — no dedup needed
    val scored = probed
      .join(
        corpusCells,
        col("_pcell") === col("_cell") && col("neighbor_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        array_distance(col("_cvec"), col("_qvec")).as("dist"))
    topKRanked(scored, k)
  }

  private def requireIntegral(df: DataFrame, c: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val dt = df.schema(c).dataType
    require(
      Set[org.apache.spark.sql.types.DataType](
        ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"knn join id column '$c' must be integral, got ${dt.simpleString}")
  }

  /** (query_id, neighbor_id, dist) → per-query top-k with dense ranks,
    * via the map-side-partial [[TopKNeighbors]] heap.
    */
  private def topKRanked(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val agg = new TopKNeighbors(k).toColumn
    scored
      .where(col("dist").isNotNull)
      .as[(Long, Long, Float)]
      .map { case (qid, nid, d) => (qid, Neighbor(nid, d)) }
      .groupByKey(_._1)
      .agg(agg)
      .flatMap { case (qid, neighbors) =>
        neighbors.iterator.zipWithIndex.map {
          case (n, i) => (qid, n.neighbor_id, i + 1)
        }
      }
      .toDF("query_id", "neighbor_id", "rank")
      .withColumn("rank", col("rank").cast("int"))
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
