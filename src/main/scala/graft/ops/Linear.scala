package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quality-classifier TRAINING on Spark — closing the loop that
  * [[TextAnalysis.linearLogitFp]] scores: fit a ridge-regularized linear
  * model over hashed bag-of-words features from labeled documents. The
  * decomposition respects scale:
  *
  *  - [[bowMoments]] is the 100 TB part — the normal-equation sufficient
  *    statistics (Gram matrix Σx·xᵀ, moment vector Σx·y, feature sums,
  *    label sums) as ONE distributed job over integer token counts.
  *    BIGINT-exact, order-independent, and re-derivable in plain SQL,
  *    so the whole distributed computation hash-gates against the
  *    oracle (lr1). Features: token md5-bucket counts, the exact
  *    contract of the `linear_bow_score` kernel/oracle pair.
  *  - [[fitRidge]] solves the (dim+1)² system on the driver — O(dim³)
  *    on a ~17×17 matrix, trivially driver-side by design: sufficient
  *    statistics ARE the point of normal equations (the alternative,
  *    distributed gradient descent, ships the corpus through every
  *    iteration; this ships 153 numbers once).
  *  - [[logitFp]] scores with the trained weights through the SAME
  *    fixed-point codegen'd kernel the hand-weighted classifier uses
  *    (weights scaled to micro-units — the money-column idiom), so
  *    train→deploy is projection-only at any scale.
  */
object Linear {

  /** Per-(doc, bucket) token counts — md5-prefix % dim, the
    * `linear_bow_score` bucket contract, all codegen'd built-ins.
    */
  private def bucketCounts(
      df: DataFrame, idCol: Column, textCol: Column, dim: Int): DataFrame =
    df.where(trim(textCol) =!= "")
      .select(idCol.as("_d"), explode(split(trim(textCol), "\\s+")).as("_t"))
      .select(
        col("_d"),
        (conv(substring(md5(col("_t")), 1, 8), 16, 10).cast("bigint") % dim).as("i"))
      .groupBy(col("_d"), col("i"))
      .agg(count(lit(1)).cast("bigint").as("x"))

  /** Normal-equation sufficient statistics: rows (kind, i, j, v) with
    * kind ∈ {"xx" (i ≤ j: Σ xᵢxⱼ), "xy" (Σ xᵢy), "x" (Σ xᵢ), "y" (Σ y),
    * "yy" (Σ y²), "n" (row count)}. `labelCol` must be integral (0/1
    * labels make every sum BIGINT-exact — the hash-gate precondition).
    * Plan: one token explode + per-doc bucket count (map-side combined),
    * a per-doc self-join for the upper-triangle products (≤ nnz² rows
    * per doc, nnz ≤ min(dim, tokens)), and dim²-bounded aggregates — no
    * driver collect, nothing corpus-sized in one task.
    */
  def bowMoments(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      labelCol: Column,
      dim: Int): DataFrame = {
    require(dim >= 1 && dim <= 1024, s"dim must be in [1, 1024], got $dim")
    val cnt = bucketCounts(df, idCol, textCol, dim)
    val lab = df.select(idCol.as("_d"), labelCol.cast("bigint").as("_y"))
    val xx = cnt.as("a")
      .join(cnt.as("b"), col("a._d") === col("b._d") && col("a.i") <= col("b.i"))
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(sum(col("a.x") * col("b.x")).as("v"))
      .select(lit("xx").as("kind"), col("i"), col("j"), col("v"))
    val xy = cnt.join(lab, "_d")
      .groupBy(col("i"))
      .agg(sum(col("x") * col("_y")).as("v"))
      .select(lit("xy").as("kind"), col("i"), lit(-1L).as("j"), col("v"))
    val xs = cnt.groupBy(col("i"))
      .agg(sum(col("x")).as("v"))
      .select(lit("x").as("kind"), col("i"), lit(-1L).as("j"), col("v"))
    val ys = lab.agg(
      sum(col("_y")).as("_sy"), sum(col("_y") * col("_y")).as("_syy"),
      count(lit(1)).as("_n"))
    val scalars = ys.select(explode(array(
      struct(lit("y").as("kind"), lit(-1L).as("i"), lit(-1L).as("j"), col("_sy").as("v")),
      struct(lit("yy").as("kind"), lit(-1L).as("i"), lit(-1L).as("j"), col("_syy").as("v")),
      struct(lit("n").as("kind"), lit(-1L).as("i"), lit(-1L).as("j"),
        col("_n").cast("bigint").as("v")))).as("s"))
      .select(col("s.kind"), col("s.i"), col("s.j"), col("s.v"))
    xx.unionByName(xy).unionByName(xs).unionByName(scalars)
  }

  /** Solve the ridge normal equations from [[bowMoments]] rows: weights
    * for the `dim` bucket features plus a trailing bias term. The
    * moments frame is ≤ dim²/2 + 2·dim + 3 rows — the only thing that
    * ever reaches the driver. Gaussian elimination with partial
    * pivoting; `ridge` (> 0) keeps rank-deficient Grams (unused buckets)
    * solvable.
    */
  def fitRidge(moments: DataFrame, dim: Int, ridge: Double = 1e-3): Array[Double] = {
    require(ridge > 0.0, s"ridge must be > 0, got $ridge")
    val rows = moments.select("kind", "i", "j", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val d = dim + 1 // + bias
    val a = Array.ofDim[Double](d, d)
    val b = new Array[Double](d)
    rows.foreach {
      case ("xx", i, j, v) =>
        a(i.toInt)(j.toInt) += v.toDouble
        if (i != j) a(j.toInt)(i.toInt) += v.toDouble
      case ("xy", i, _, v) => b(i.toInt) += v.toDouble
      case ("x", i, _, v) =>
        a(i.toInt)(dim) += v.toDouble
        a(dim)(i.toInt) += v.toDouble
      case ("y", _, _, v) => b(dim) += v.toDouble
      case ("n", _, _, v) => a(dim)(dim) += v.toDouble
      case _ => ()
    }
    var i = 0
    while (i < d) { a(i)(i) += ridge; i += 1 }
    // Gaussian elimination, partial pivoting
    val w = b.clone()
    var c = 0
    while (c < d) {
      var p = c
      var r = c + 1
      while (r < d) { if (math.abs(a(r)(c)) > math.abs(a(p)(c))) p = r; r += 1 }
      val tmp = a(c); a(c) = a(p); a(p) = tmp
      val tw = w(c); w(c) = w(p); w(p) = tw
      val piv = a(c)(c)
      require(math.abs(piv) > 1e-12, s"singular system at column $c despite ridge")
      r = c + 1
      while (r < d) {
        val f = a(r)(c) / piv
        if (f != 0.0) {
          var k = c
          while (k < d) { a(r)(k) -= f * a(c)(k); k += 1 }
          w(r) -= f * w(c)
        }
        r += 1
      }
      c += 1
    }
    c = d - 1
    while (c >= 0) {
      var k = c + 1
      var acc = w(c)
      while (k < d) { acc -= a(c)(k) * w(k); k += 1 }
      w(c) = acc / a(c)(c)
      c -= 1
    }
    w
  }

  /** Score texts with trained weights through the fixed-point
    * `linear_bow_score` kernel (micro-unit scaling): logit_fp ≥ `thrFp`
    * ⇔ predicted regression value ≥ thr. Projection-only.
    */
  def logitFp(text: Column, weights: Array[Double], dim: Int): Column = {
    require(weights.length == dim + 1, s"need $dim weights + bias, got ${weights.length}")
    val fp = weights.take(dim).map(w => math.round(w * 1e6))
    val biasFp = math.round(weights(dim) * 1e6)
    // constant (per-document) bias — the regression intercept; NOT the
    // per-token mean-pool bias of TextAnalysis.linearLogitFp
    TextAnalysis.linearScore(text, fp) + lit(biasFp)
  }
}
