package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{array_distance, bin1_encode, bin1_hamming, float_vector, sq8_decode, sq8_distance_sq, sq8_encode, Bin1, Sq8}

/** Int8 scalar-quantized (SQ8) storage and search over embedding columns.
  *
  * The scale story: an embedding column dominates a training-data table's
  * bytes (64-dim f32 = 256 B/row; a text row is often smaller). Compressing
  * it 4× to per-element int8 codes cuts the scan IO of every
  * similarity-shaped query by the same factor, and coarse ranking runs
  * directly on the 64 B codes — exact 64-bit integer arithmetic, no decode.
  * Two-phase search then touches full-precision floats only for the
  * oversampled survivors (`k·oversample` rows, not the corpus).
  */
object Quantize {

  /** Add an SQ8 code column for `vecCol` (drop the float column at write
    * time for the 4× storage cut; codes are self-contained for search).
    */
  def compress(df: DataFrame, vecCol: String, codeCol: String = "sq8"): DataFrame =
    df.withColumn(codeCol, sq8_encode(col(vecCol)))

  /** Reconstruct an `array<float>` column from SQ8 codes. */
  def decompress(df: DataFrame, codeCol: String, vecCol: String): DataFrame =
    df.withColumn(vecCol, sq8_decode(col(codeCol)))

  /** Coarse top-k directly on a code column: integer code-space squared L2,
    * `TakeOrderedAndProject` (per-partition heaps, k rows to the driver).
    * Deterministic — ties break by `idCol`.
    */
  def coarseTopK(
      df: DataFrame,
      idCol: String,
      codeCol: String,
      query: Seq[Float],
      k: Int): DataFrame = {
    val qCodes = Sq8.encode(query.toArray)
    df.select(
        col(idCol),
        sq8_distance_sq(col(codeCol), lit(qCodes)).as("code_dist"))
      .orderBy(col("code_dist").asc_nulls_last, col(idCol))
      .limit(k)
  }

  /** Two-phase compressed top-k: coarse-rank the whole corpus in code space
    * (4× less IO when codes are the stored column), then exact float
    * re-rank of the `k·oversample` survivors. The survivor set is tiny, so
    * the refine join broadcasts it; at scale the full-precision column is
    * only materialized for those rows.
    */
  def sq8TopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Float],
      k: Int,
      oversample: Int = 4,
      codeCol: Option[String] = None): DataFrame = {
    require(k > 0, "k must be > 0")
    require(oversample >= 1, "oversample must be >= 1")
    val codes: Column = codeCol.map(col).getOrElse(sq8_encode(col(vecCol)))
    val qCodes = Sq8.encode(query.toArray)
    val survivors = df
      .select(col(idCol), sq8_distance_sq(codes, lit(qCodes)).as("code_dist"))
      .orderBy(col("code_dist").asc_nulls_last, col(idCol))
      .limit(k * oversample)
      .select(col(idCol))
    df.join(broadcast(survivors), idCol)
      .orderBy(
        array_distance(col(vecCol), float_vector(query)).asc_nulls_last,
        col(idCol))
      .limit(k)
  }

  /** Add a packed sign-bit (1-bit) code column for `vecCol` — the deepest
    * flat compression tier (32× under f32; 8 B for a 64-dim vector).
    */
  def binCompress(df: DataFrame, vecCol: String, codeCol: String = "bin1"): DataFrame =
    df.withColumn(codeCol, bin1_encode(col(vecCol)))

  /** Coarse top-k directly on packed sign codes: exact integer Hamming
    * ranking (xor + popcount — the cheapest coarse key the engine has),
    * `TakeOrderedAndProject`. Hamming over dim bits is massively tied, so
    * the `idCol` tie-break carries most of the determinism here — which is
    * also why this tier only ever feeds a refine phase in practice.
    */
  def binCoarseTopK(
      df: DataFrame,
      idCol: String,
      codeCol: String,
      query: Seq[Float],
      k: Int): DataFrame = {
    val qCodes = Bin1.encode(query.toArray)
    df.select(
        col(idCol),
        bin1_hamming(col(codeCol), lit(qCodes)).as("hamming"))
      .orderBy(col("hamming").asc_nulls_last, col(idCol))
      .limit(k)
  }

  /** Two-phase binary-quantized top-k: Hamming coarse rank over the packed
    * sign codes (IO per candidate = dim/8 BYTES — 32× under the float
    * column), exact float re-rank of the `k·oversample` survivors. The
    * sign sketch is a coarse angular surrogate, so binary needs a larger
    * oversample than SQ8/PQ for the same recall — it buys the steepest IO
    * cut in exchange (the classic recall/IO frontier point; at covering
    * oversample the result is exactly brute force, which is how the
    * correctness gate pins the machinery).
    */
  def binTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Float],
      k: Int,
      oversample: Int = 16,
      codeCol: Option[String] = None): DataFrame = {
    require(k > 0, "k must be > 0")
    require(oversample >= 1, "oversample must be >= 1")
    val codes: Column = codeCol.map(col).getOrElse(bin1_encode(col(vecCol)))
    val qCodes = Bin1.encode(query.toArray)
    val survivors = df
      .select(col(idCol), bin1_hamming(codes, lit(qCodes)).as("hamming"))
      .orderBy(col("hamming").asc_nulls_last, col(idCol))
      .limit(k * oversample)
      .select(col(idCol))
    df.join(broadcast(survivors), idCol)
      .orderBy(
        array_distance(col(vecCol), float_vector(query)).asc_nulls_last,
        col(idCol))
      .limit(k)
  }

  /** Mean-pool member vectors into one quantized embedding per group IN
    * CODE SPACE — the multi-vector → single-vector reduction (token
    * embeddings → document embedding, patch embeddings → image
    * embedding) done on the 4×-smaller SQ8 codes with EXACT integer
    * arithmetic: per (group, dim), `floor(Σ code / n)` — floor, not
    * truncate, so negative sums round identically everywhere (the
    * hash-gate detail; code sums stay far under 2⁵³ so the double
    * division is exact). One map-side-combined groupBy of |groups|·dim
    * rows; output (group_id, dim, code) composes directly with
    * [[coarseTopK]]-style integer scoring or [[graft.functions.sq8_decode]]
    * for float use.
    */
  def sq8MeanPool(df: DataFrame, groupCol: Column, vecCol: String): DataFrame =
    df.select(
        groupCol.as("group_id"),
        posexplode(graft.functions.sq8_codes(sq8_encode(col(vecCol))))
          .as(Seq("dim", "c")))
      .groupBy(col("group_id"), col("dim"))
      .agg(
        floor(sum(col("c")).cast("double") / count(lit(1))).cast("bigint").as("code"))
}
