package graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.{Column, SparkSession}

/** Column-API entry points for the engine's vector functions, mirroring
  * `org.apache.spark.sql.functions`. All are native Catalyst expressions
  * with whole-stage codegen — no UDF boxing.
  */
package object functions {

  private def col(e: Expression): Column = Bridge.column(e)
  private def expr(c: Column): Expression = Bridge.expression(c)

  /** Euclidean distance between two `array<float>` columns. */
  def array_distance(a: Column, b: Column): Column =
    col(ArrayDistance(expr(a), expr(b)))

  /** Squared L2 distance (the reference's internal ranking key). */
  def array_squared_l2(a: Column, b: Column): Column =
    col(ArraySquaredL2(expr(a), expr(b)))

  def array_dot(a: Column, b: Column): Column =
    col(ArrayDot(expr(a), expr(b)))

  def array_cosine_similarity(a: Column, b: Column): Column =
    col(ArrayCosineSimilarity(expr(a), expr(b)))

  /** Distinct word n-gram shingles of a text column (native expression). */
  def word_shingles(text: Column, n: Int): Column =
    col(WordShingles(expr(text), n))

  /** All word n-grams, duplicates kept (native expression). */
  def word_ngrams(text: Column, n: Int): Column =
    col(WordNgrams(expr(text), n))

  /** Winnowing fingerprint selection — array<struct<pos,fp>> (native
    * expression; see [[TextHash.winnowFingerprints]]).
    */
  def winnow_fps(text: Column, k: Int, w: Int, portable: Boolean = true): Column =
    col(WinnowFingerprints(expr(text), k, w, portable))

  /** k-slot MinHash signature of a shingle array (native expression). */
  def minhash_signature(shingleCol: Column, numHashes: Int): Column =
    col(MinHashSignature(expr(shingleCol), numHashes))

  /** 64-bit SimHash of a token array (native expression). */
  def simhash64(tokens: Column): Column =
    col(SimHash64(expr(tokens)))

  /** Jaccard of two ascending long arrays (allocation-free merge). */
  def sorted_jaccard(a: Column, b: Column): Column =
    col(SortedArrayJaccard(expr(a), expr(b)))

  /** robots.txt permission for `path` under `agent`'s rules (native
    * expression; RFC 9309 longest-match semantics — see [[RobotsTxt]]).
    * Null when robots or path is null; a pipeline treating missing
    * robots as allow-all should `coalesce(..., lit(true))`.
    */
  def robots_allowed(robotsTxt: Column, path: Column, agent: String = "*"): Column =
    col(RobotsAllowed(expr(robotsTxt), expr(path), agent))

  /** Group-scoped Crawl-delay seconds for the agent; null when the
    * selected group declares none (see [[RobotsCrawlDelay]]).
    */
  def robots_crawl_delay(robotsTxt: Column, agent: String = "*"): Column =
    col(RobotsCrawlDelay(expr(robotsTxt), agent))

  /** Per-vocabulary marker-word counts in one tokenization pass. */
  def linear_bow_score(text: Column, weights: Array[Long]): Column =
    col(LinearBowScore(expr(text), weights))

  def normalize_text(
      text: Column, lower: Boolean = true, stripAccents: Boolean = false): Column =
    col(NormalizeText(expr(text), lower, stripAccents))

  def marker_counts(text: Column, vocabularies: Seq[Seq[String]]): Column =
    col(MarkerCounts(expr(text), vocabularies))

  /** Most-frequent-word-n-gram share (Gopher-style repetition signal). */
  def top_ngram_ratio(text: Column, n: Int): Column =
    col(TopNgramRatio(expr(text), n))

  /** Nearest-centroid id against a flat row-major k×dim matrix (native
    * expression; null vector / dim mismatch → null). The map-side IVF cell
    * assignment for bucketed similarity joins.
    */
  def nearest_centroid(vec: Column, centroids: Array[Float], dim: Int): Column =
    col(NearestCentroid(expr(vec.cast("array<float>")), centroids, dim))

  /** Indices of the `p` nearest centroids (multi-probe cell assignment). */
  def nearest_centroids(vec: Column, centroids: Array[Float], dim: Int, p: Int): Column =
    col(NearestCentroids(expr(vec.cast("array<float>")), centroids, dim, p))

  /** Count of `bounds` elements `<= v` (sorted-array binary search; the
    * equi-depth bucket rank of the z-order writer). Null stays null.
    */
  def sorted_rank(v: Column, bounds: Array[Double]): Column =
    col(SortedRank(expr(v.cast("double")), bounds))

  /** Int8 scalar-quantize a float vector to binary codes (4× smaller). */
  def sq8_encode(vec: Column): Column = col(Sq8Encode(expr(vec)))

  /** Reconstruct an `array<float>` from SQ8 binary codes. */
  def sq8_decode(codes: Column): Column = col(Sq8Decode(expr(codes)))

  /** SQ8 binary codes as `array<int>` for SQL-side aggregation. */
  def sq8_codes(codes: Column): Column = col(Sq8Codes(expr(codes)))

  /** Exact integer squared L2 between two SQ8 code vectors. */
  def sq8_distance_sq(a: Column, b: Column): Column =
    col(Sq8DistanceSq(expr(a), expr(b)))

  /** 1-bit sign-quantize a float vector to packed binary codes (32× smaller). */
  def bin1_encode(vec: Column): Column = col(Bin1Encode(expr(vec)))

  /** Exact Hamming distance between two packed sign-code vectors. */
  def bin1_hamming(a: Column, b: Column): Column =
    col(Bin1Hamming(expr(a), expr(b)))

  /** Spark SQL has no `[...]` array literal — helper for query vectors. */
  def float_vector(values: Seq[Float]): Column = {
    import org.apache.spark.sql.functions.{array, lit}
    array(values.map(v => lit(v)): _*).cast("array<float>")
  }

  /** All SQL-registrable functions: name -> (info, builder). */
  private[graft] val registry: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      ("array_distance", "Euclidean (L2) distance between two float vectors",
        (cs: Seq[Expression]) => ArrayDistance(cs(0), cs(1))),
      ("array_squared_l2", "Squared L2 distance between two float vectors",
        (cs: Seq[Expression]) => ArraySquaredL2(cs(0), cs(1))),
      ("array_dot", "Inner product of two float vectors",
        (cs: Seq[Expression]) => ArrayDot(cs(0), cs(1))),
      ("array_cosine_similarity", "Cosine similarity of two float vectors",
        (cs: Seq[Expression]) => ArrayCosineSimilarity(cs(0), cs(1))),
      ("word_shingles", "Distinct word n-gram shingles of a string",
        (cs: Seq[Expression]) => WordShingles(cs(0), intArg(cs, 1, "word_shingles"))),
      ("word_ngrams", "All word n-grams of a string, duplicates kept",
        (cs: Seq[Expression]) => WordNgrams(cs(0), intArg(cs, 1, "word_ngrams"))),
      ("minhash_signature", "k-slot MinHash signature of a shingle array",
        (cs: Seq[Expression]) => MinHashSignature(cs(0), intArg(cs, 1, "minhash_signature"))),
      ("winnow_fps", "Winnowing fingerprint selection of a string",
        (cs: Seq[Expression]) => WinnowFingerprints(
          cs(0), intArg(cs, 1, "winnow_fps"), intArg(cs, 2, "winnow_fps"),
          portable = true)),
      ("simhash64", "64-bit SimHash of a token array",
        (cs: Seq[Expression]) => SimHash64(cs(0))),
      ("sorted_jaccard", "Jaccard similarity of two ascending long arrays",
        (cs: Seq[Expression]) => SortedArrayJaccard(cs(0), cs(1))),
      ("top_ngram_ratio", "Most-frequent word n-gram share of a string",
        (cs: Seq[Expression]) => TopNgramRatio(cs(0), intArg(cs, 1, "top_ngram_ratio"))),
      ("sq8_encode", "Int8 scalar-quantize a float vector to binary codes",
        (cs: Seq[Expression]) => Sq8Encode(cs(0))),
      ("sq8_decode", "Reconstruct a float vector from SQ8 binary codes",
        (cs: Seq[Expression]) => Sq8Decode(cs(0))),
      ("sq8_codes", "SQ8 binary codes as array<int>",
        (cs: Seq[Expression]) => Sq8Codes(cs(0))),
      ("sq8_distance_sq", "Integer squared L2 between two SQ8 code vectors",
        (cs: Seq[Expression]) => Sq8DistanceSq(cs(0), cs(1))),
      ("bin1_encode", "1-bit sign-quantize a float vector to packed binary codes",
        (cs: Seq[Expression]) => Bin1Encode(cs(0))),
      ("bin1_hamming", "Hamming distance between two packed sign-code vectors",
        (cs: Seq[Expression]) => Bin1Hamming(cs(0), cs(1))),
      ("normalize_text", "Unicode NFC + optional accent strip + ROOT lowercase",
        (cs: Seq[Expression]) => NormalizeText(
          cs(0),
          lower = if (cs.length > 1) boolArg(cs, 1, "normalize_text") else true,
          stripAccents = if (cs.length > 2) boolArg(cs, 2, "normalize_text") else false)),
    ).map { case (name, _, builder) =>
      (FunctionIdentifier(name), new ExpressionInfo("graft.functions", name), builder)
    }

  private def boolArg(cs: Seq[Expression], i: Int, fn: String): Boolean = cs(i) match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn argument ${i + 1} must be a boolean literal, got $other")
  }

  private def intArg(cs: Seq[Expression], i: Int, fn: String): Int = cs(i) match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn argument ${i + 1} must be an integer literal, got $other")
  }

  /** Register the SQL functions on an existing session (the extension-less
    * path used by Verify/Bench; `GraftExtensions` covers
    * `spark.sql.extensions`-configured sessions).
    */
  def registerAll(spark: SparkSession): Unit = registry.foreach {
    case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }
}
