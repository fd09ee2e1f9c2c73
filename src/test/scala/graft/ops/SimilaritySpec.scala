package graft.ops

import org.apache.spark.sql.functions.{col, when}

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // two tight, well-separated clusters: cell bucketing has recall 1 here
  private def clustered = {
    val rnd = new scala.util.Random(5)
    val a = (0 until 10).map(i => (i.toLong, Seq.fill(4)(1.0f + rnd.nextFloat() * 0.01f)))
    val b = (10 until 20).map(i => (i.toLong, Seq.fill(4)(-1.0f - rnd.nextFloat() * 0.01f)))
    (a ++ b).toDF("id", "v").select(col("id"), col("v").cast("array<float>").as("v"))
  }

  test("ivfCellPairs finds within-cluster pairs on separated clusters") {
    val centroids = Array(1f, 1f, 1f, 1f, -1f, -1f, -1f, -1f)
    val pairs = Similarity
      .ivfCellPairs(clustered, "id", "v", centroids, 4, threshold = 0.99)
      .as[(Long, Long)].collect().toSet
    // all within-cluster pairs (cos ~ 1), no cross-cluster pairs (cos ~ -1)
    assert(pairs.size == 2 * (10 * 9 / 2))
    assert(pairs.forall { case (a, b) => (a < 10) == (b < 10) })
  }

  test("withCell assigns nearest cells via a codegen'd expression (no UDF)") {
    val centroids = Array(1f, 1f, 1f, 1f, -1f, -1f, -1f, -1f)
    val df = Similarity.withCell(clustered, "v", centroids, 4)
    assert(!df.queryExecution.executedPlan.toString.contains("ScalaUDF"))
    val cells = df.select("id", "_cell").as[(Long, Int)].collect().toMap
    assert((0L until 10L).forall(cells(_) == 0))
    assert((10L until 20L).forall(cells(_) == 1))
  }

  test("withCell maps null and dim-mismatched vectors to cell -1") {
    val df = Seq(
      (0L, Some(Seq(1f, 1f, 1f, 1f))),
      (1L, None),
      (2L, Some(Seq(1f, 1f)))).toDF("id", "v")
      .select(col("id"), col("v").cast("array<float>").as("v"))
    val centroids = Array(1f, 1f, 1f, 1f, -1f, -1f, -1f, -1f)
    val cells = Similarity.withCell(df, "v", centroids, 4)
      .select("id", "_cell").as[(Long, Int)].collect().toMap
    assert(cells(0L) == 0 && cells(1L) == -1 && cells(2L) == -1)
  }

  test("knnJoin returns k ranked neighbors per query") {
    val df = clustered
    val out = Similarity
      .knnJoin(df.where(col("id") === 0), df, "id", "id", "v", 3)
      .as[(Long, Long, Int)].collect()
    assert(out.length == 3)
    assert(out.map(_._3).sorted.toSeq == Seq(1, 2, 3))
    assert(out.forall(_._2 < 10)) // neighbors from the same cluster
  }

  test("ivfKnnJoin at exhaustive probes equals brute knnJoin exactly") {
    val df = clustered
    val centroids = Array(1f, 1f, 1f, 1f, -1f, -1f, -1f, -1f)
    val queries = df.where(col("id") === 0 || col("id") === 15)
    val brute = Similarity.knnJoin(queries, df, "id", "id", "v", 3)
      .as[(Long, Long, Int)].collect().toSet
    val ivf = Similarity
      .ivfKnnJoin(queries, df, "id", "id", "v", centroids, 4, 3, probes = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(ivf == brute)
  }

  test("ivfKnnJoin at 1 probe stays within the query's own cluster") {
    val df = clustered
    val centroids = Array(1f, 1f, 1f, 1f, -1f, -1f, -1f, -1f)
    val out = Similarity
      .ivfKnnJoin(df.where(col("id") === 15), df, "id", "id", "v",
        centroids, 4, k = 30, probes = 1)
      .as[(Long, Long, Int)].collect()
    // only the 9 same-cell rows are candidates, self excluded, k un-hit
    assert(out.length == 9)
    assert(out.forall(_._2 >= 10))
  }

  test("knnJoin rejects an over-limit query side instead of broadcasting it") {
    val df = clustered
    val ex = intercept[IllegalArgumentException] {
      Similarity.knnJoin(df, df, "id", "id", "v", 3, maxQueries = 5L)
    }
    assert(ex.getMessage.contains("ivfKnnJoin"))
  }

  test("knnJoin rejects non-integral id columns instead of nulling them") {
    val df = Seq(("a", Seq(0f, 0f, 0f, 0f))).toDF("sid", "v")
      .select(col("sid"), col("v").cast("array<float>").as("v"))
    val ex = intercept[IllegalArgumentException] {
      Similarity.knnJoin(df, df, "sid", "sid", "v", 1)
    }
    assert(ex.getMessage.contains("must be integral"))
  }

  test("ivfCellPairs recall gate vs exact pairs on testdata, multi-probe") {
    val sfDir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val path = s"$sfDir/embeddings.parquet"
    val ti = graft.ivf.IndexManager.ensure(spark, path, "embedding")
    val centroids = graft.ivf.IndexStore.default
      .load(ti.files.head, "embedding").get.centroids
    val emb = spark.read.parquet(path)
    val exact = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.3)
      .as[(Long, Long)].collect().toSet
    val single = Similarity
      .ivfCellPairs(emb, "vec_id", "embedding", centroids, ti.dim, 0.3)
      .as[(Long, Long)].collect().toSet
    val multi = Similarity
      .ivfCellPairs(emb, "vec_id", "embedding", centroids, ti.dim, 0.3, probes = 4)
      .as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    // precision is exact by construction: bucketed pairs are cosine-verified
    assert(single.subsetOf(exact))
    assert(multi.subsetOf(exact))
    // probing more cells only adds pairs (home cell is always probe #1)
    assert(single.subsetOf(multi))
    val r1 = single.size.toDouble / exact.size
    val r4 = multi.size.toDouble / exact.size
    assert(r4 >= r1)
    info(f"cell-pair recall: single-probe $r1%.3f, 4-probe $r4%.3f (${exact.size} exact pairs)")
    // measured on this corpus: 0.33 single-probe → 0.78 at 4 probes (cos 0.3
    // is a WEAK-similarity threshold — pairs span cell borders; near-dup
    // thresholds like 0.9 co-locate far more). Gate guards regressions.
    assert(r4 >= 0.7, s"multi-probe recall $r4 below gate")
  }

  test("ivfCellPairs bounds the pair count on a single-cell-degenerate corpus") {
    // 600 near-identical vectors: one cell holds everything and the second
    // key cannot split it (every member's second cell is the same) — the
    // star path must bound the output at O(m·pivots), not m(m-1)/2
    val m = 600
    val df = (0 until m).map(i => (i.toLong, Seq(1.0f + i * 1e-5f, 1.0f, 1.0f, 1.0f)))
      .toDF("id", "v").select(col("id"), col("v").cast("array<float>").as("v"))
    val centroids = Array(1f, 1f, 1f, 1f, -1f, -1f, -1f, -1f)
    val pairs = Similarity
      .ivfCellPairs(df, "id", "v", centroids, 4, threshold = 0.99,
        maxCellSize = 50L, starPivots = 8)
      .as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    val uncapped = m.toLong * (m - 1) / 2 // 179 700
    assert(pairs.length < m * 40,
      s"pair count ${pairs.length} not bounded (uncapped would be $uncapped)")
    // connectivity for the clustering consumer: every member reaches a pivot
    val covered = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(covered == (0L until m.toLong).toSet)
  }

  test("ivfKnnJoin stays exact at exhaustive probes when the hot-cell cap engages") {
    val m = 120
    val dense = (0 until m).map(i => (i.toLong, Seq(1.0f + i * 1e-4f, 1.0f, 1.0f, 1.0f)))
    val sparse = (m until m + 5).map(i =>
      (i.toLong, Seq(-1.0f - (i - m) * 1e-3f, -1.0f, -1.0f, -1.0f)))
    val df = (dense ++ sparse).toDF("id", "v")
      .select(col("id"), col("v").cast("array<float>").as("v"))
    val centroids = Array(1f, 1f, 1f, 1f, -1f, -1f, -1f, -1f)
    val queries = df.where(col("id") === 0 || col("id") === m)
    val brute = Similarity.knnJoin(queries, df, "id", "id", "v", 5)
      .as[(Long, Long, Int)].collect().toSet
    // dense cell (120 members) blows the cap of 20 → hot path engages; the
    // exhaustive probe set supplies every second key, so nothing is lost
    val capped = Similarity
      .ivfKnnJoin(queries, df, "id", "id", "v", centroids, 4, 5,
        probes = 2, maxCellSize = 20L)
      .as[(Long, Long, Int)].collect().toSet
    assert(capped == brute)
  }

  test("ivfKnnJoin at probes=1 returns hot-cell neighbors (cap disengages)") {
    // regression: the second-key refinement needs probes >= 2 (the second
    // key comes from the query's own probe set); engaging it at probes=1
    // scored ZERO candidates from hot cells — a recall cliff to nothing
    // from exactly the cell a query's neighbors live in
    val m = 120
    val dense = (0 until m).map(i => (i.toLong, Seq(1.0f + i * 1e-4f, 1.0f, 1.0f, 1.0f)))
    val df = dense.toDF("id", "v")
      .select(col("id"), col("v").cast("array<float>").as("v"))
    val centroids = Array(1f, 1f, 1f, 1f, -1f, -1f, -1f, -1f)
    val queries = df.where(col("id") === 0)
    val got = Similarity
      .ivfKnnJoin(queries, df, "id", "id", "v", centroids, 4, 5,
        probes = 1, maxCellSize = 20L)
      .as[(Long, Long, Int)].collect().toSet
    val brute = Similarity.knnJoin(queries, df, "id", "id", "v", 5)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == brute, s"probes=1 over a hot home cell must still score it")
  }

  test("cosineTopK ranks by similarity descending") {
    val top = Similarity
      .cosineTopK(clustered, "v", Seq(1f, 1f, 1f, 1f), 5)
      .select("id").as[Long].collect()
    assert(top.forall(_ < 10))
  }

  test("colbertTopKIvf at exhaustive probes equals the flat aggregation exactly") {
    val centroids = Array(1f, 1f, 1f, 1f, -1f, -1f, -1f, -1f)
    val grouped = clustered.withColumn("g", (col("id") / 5).cast("bigint"))
    val tokens = Seq(Seq(1f, 1f, 1f, 1f), Seq(-1f, -1f, 1f, 1f))
    val exact = Similarity.colbertTopK(grouped, "g", "v", tokens, 3)
      .as[(Long, Double)].collect().toSeq
    val plaid = Similarity
      .colbertTopKIvf(grouped, "g", "v", tokens, 3, centroids, 4, probes = 2)
      .as[(Long, Double)].collect().toSeq
    assert(plaid == exact)
  }

  test("colbertTopKIvf at 1 probe only scores docs with a member in a probed cell") {
    val centroids = Array(1f, 1f, 1f, 1f, -1f, -1f, -1f, -1f)
    val grouped = clustered.withColumn("g", (col("id") / 5).cast("bigint"))
    // one token aligned with cluster A: probing 1 cell admits only groups
    // 0 and 1 (ids 0-9); groups 2/3 are never scored — the probe trade
    val out = Similarity
      .maxSimTopKIvf(grouped, "g", "v", Seq(1f, 1f, 1f, 1f), 4, centroids, 4, probes = 1)
      .select("g").as[Long].collect().toSet
    assert(out == Set(0L, 1L))
    // the multi-token union admits both clusters: token 2 probes cell B
    val both = Similarity
      .colbertTopKIvf(grouped, "g", "v",
        Seq(Seq(1f, 1f, 1f, 1f), Seq(-1f, -1f, -1f, -1f)), 4, centroids, 4, probes = 1)
      .select("g").as[Long].collect().toSet
    assert(both == Set(0L, 1L, 2L, 3L))
  }

  test("quantizedOutliers flags exactly the far-from-every-centroid rows") {
    // centroids at (1,0,0,0) and (-1,0,0,0); codes ±127 on dim 0
    val centroids = Array(1f, 0f, 0f, 0f, -1f, 0f, 0f, 0f)
    val rows = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),    // on centroid 0 → dist 0
      (2L, Seq(-1f, 0f, 0f, 0f)),   // on centroid 1 → dist 0
      (3L, Seq(0f, 1f, 1f, 1f)),    // 127² + 3·127² vs both → 4·127² = 64516
      (4L, Seq(0.5f, 0f, 0f, 0f)))  // code 64: (127-64)² = 3969 to c0
      .toDF("id", "v")
    val flagged = Similarity
      .quantizedOutliers(rows, "id", "v", centroids, 4, maxCodeDistSq = 10000L)
      .as[(Long, Long)].collect().toMap
    assert(flagged == Map(3L -> 64516L))
    // threshold 0 keeps rows strictly above zero only
    val all = Similarity
      .quantizedOutliers(rows, "id", "v", centroids, 4, maxCodeDistSq = 0L)
      .as[(Long, Long)].collect().toMap
    assert(all == Map(3L -> 64516L, 4L -> 3969L))
    intercept[IllegalArgumentException](
      Similarity.quantizedOutliers(rows, "id", "v", centroids, 3, 1L))
    intercept[IllegalArgumentException](
      Similarity.quantizedOutliers(rows, "id", "v", Array.empty[Float], 4, 1L))
  }

  test("mrlTopK: full-prefix and covering-oversample forms are exactly brute force") {
    val rnd = new scala.util.Random(11)
    val dim = 8
    val n = 200
    val df = (0 until n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "v").select(col("id"), col("v").cast("array<float>").as("v"))
    val q = Seq.fill(dim)(rnd.nextFloat() * 2 - 1)
    val brute = df
      .orderBy(
        graft.functions.array_distance(col("v"), graft.functions.float_vector(q)),
        col("id"))
      .limit(10).select("id").as[Long].collect().toSeq
    // prefixDim = dim → coarse ranking IS the exact ranking, any oversample
    val full = Similarity.mrlTopK(df, "id", "v", q, 10, prefixDim = dim, oversample = 1)
      .select("id").as[Long].collect().toSeq
    assert(full == brute)
    // covering oversample → exact regardless of prefix quality
    val covering = Similarity.mrlTopK(df, "id", "v", q, 10, prefixDim = 2, oversample = n / 10)
      .select("id").as[Long].collect().toSeq
    assert(covering == brute)
    // MRL-shaped data (information concentrated in the leading dims): a
    // small oversample already recovers most of the true top-k
    val mrl = (0 until n).map { i =>
      val lead = Seq.fill(4)(rnd.nextFloat() * 2 - 1)
      (i.toLong, lead ++ Seq.fill(dim - 4)(rnd.nextFloat() * 0.01f))
    }.toDF("id", "v").select(col("id"), col("v").cast("array<float>").as("v"))
    val bruteMrl = mrl
      .orderBy(
        graft.functions.array_distance(col("v"), graft.functions.float_vector(q)),
        col("id"))
      .limit(10).select("id").as[Long].collect().toSet
    val approx = Similarity.mrlTopK(mrl, "id", "v", q, 10, prefixDim = 4, oversample = 3)
      .select("id").as[Long].collect().toSet
    assert((approx intersect bruteMrl).size >= 8,
      s"prefix-dim recall too low: ${(approx intersect bruteMrl).size}/10")
    // a stored prefix column is honored (the 100 TB IO fast path)
    val withPrefix = mrl.withColumn("v16",
      org.apache.spark.sql.functions.slice(col("v"), 1, 4))
    val viaCol = Similarity.mrlTopK(withPrefix, "id", "v", q, 10, prefixDim = 4,
      oversample = 3, prefixCol = Some("v16"))
      .select("id").as[Long].collect().toSet
    assert(viaCol == approx)
    // NULL stored prefixes are SKIPPED (nulls-last), matching every other
    // top-k path's skip-null semantics — not crashed on (round-10 advice:
    // size(NULL) is NULL, which used to fall into the raise_error branch)
    val withNulls = withPrefix.withColumn("v16",
      when(col("id") % 7 === 0, org.apache.spark.sql.functions.lit(null))
        .otherwise(col("v16")))
    val expectNoNullIds = Similarity
      .mrlTopK(withPrefix.where(col("id") % 7 =!= 0), "id", "v", q, 10,
        prefixDim = 4, oversample = 3, prefixCol = Some("v16"))
      .select("id").as[Long].collect().toSeq
    val viaNulls = Similarity.mrlTopK(withNulls, "id", "v", q, 10,
      prefixDim = 4, oversample = 3, prefixCol = Some("v16"))
      .select("id").as[Long].collect().toSeq
    assert(viaNulls == expectNoNullIds)
    // a NON-null wrong-width stored prefix still fails loudly
    val badWidth = withPrefix.withColumn("v16",
      org.apache.spark.sql.functions.slice(col("v"), 1, 3))
    val crash = intercept[Exception] {
      Similarity.mrlTopK(badWidth, "id", "v", q, 10, prefixDim = 4,
        oversample = 3, prefixCol = Some("v16"))
        .select("id").as[Long].collect()
    }
    assert(crash.getMessage.contains("must have exactly") ||
      Option(crash.getCause).exists(_.getMessage.contains("must have exactly")))
    intercept[IllegalArgumentException](
      Similarity.mrlTopK(df, "id", "v", q, 0, prefixDim = 4))
    intercept[IllegalArgumentException](
      Similarity.mrlTopK(df, "id", "v", q, 10, prefixDim = dim + 1))
  }

  test("mmrTopK trades relevance against redundancy; lambda=1 is plain top-k") {
    // two near-identical docs at +24° from the query and one equally
    // relevant doc at −24°: relevance-only picks the twins, MMR swaps the
    // redundant twin for the mirror doc (cos(twin, mirror) ≈ 0.62 vs
    // cos(twin, twin) ≈ 1 — the penalty term is what differs)
    val df = Seq(
      (1L, Seq(0.9f, 0.435f, 0f, 0f)),  // twin a (marginally closer)
      (2L, Seq(0.9f, 0.436f, 0f, 0f)),  // twin b (~identical to a)
      (3L, Seq(0.9f, -0.436f, 0f, 0f)), // mirror of twin b: equal relevance, distinct
      (4L, Seq(0f, 0f, 1f, 0f)))        // irrelevant
      .toDF("id", "v").select(col("id"), col("v").cast("array<float>").as("v"))
    val q = Seq(1f, 0f, 0f, 0f)
    val diverse = Similarity.mmrTopK(df, "id", "v", q, k = 2, lambda = 0.7, poolSize = 4)
      .select("id").as[Long].collect().toSeq
    assert(diverse == Seq(1L, 3L), s"expected twin+mirror, got $diverse")
    // lambda = 1: pure relevance — both twins win
    val relevance = Similarity.mmrTopK(df, "id", "v", q, k = 2, lambda = 1.0, poolSize = 4)
      .select("id").as[Long].collect().toSeq
    assert(relevance == Seq(1L, 2L))
    // rank is selection order, k > pool truncates gracefully
    val all = Similarity.mmrTopK(df, "id", "v", q, k = 10, lambda = 0.7, poolSize = 10)
      .select("rank").as[Int].collect().toSeq
    assert(all == Seq(1, 2, 3, 4))
    intercept[IllegalArgumentException](
      Similarity.mmrTopK(df, "id", "v", q, k = 5, poolSize = 4))
    intercept[IllegalArgumentException](
      Similarity.mmrTopK(df, "id", "v", q, k = 1, lambda = 1.5))
  }

  test("probeCellsCosine ranks cells by centroid cosine, deterministic ties") {
    val centroids = Array(1f, 0f, 0f, 1f, -1f, 0f)
    assert(Similarity.probeCellsCosine(Array(1f, 0f), centroids, 2, 2).toSeq == Seq(0, 1))
    assert(Similarity.probeCellsCosine(Array(-1f, 0f), centroids, 2, 1).toSeq == Seq(2))
    // zero-norm query: all scores 0, ties break by cell id
    assert(Similarity.probeCellsCosine(Array(0f, 0f), centroids, 2, 2).toSeq == Seq(0, 1))
  }

  // --- r11 review regressions ---

  test("mmrTopK skips NaN/mismatched vectors, refuses string ids, handles negative ids") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(Float.NaN, 1.0f)),      // NaN elements: would sort FIRST unguarded
      (3L, Seq(0.9f, 0.1f, 0.5f)),     // dim mismatch: _simq null
      (4L, Seq(0.5f, 0.5f)))
      .toDF("id", "v").select(col("id"), col("v").cast("array<float>").as("v"))
    val q = Seq(1.0f, 0.0f)
    val out = Similarity.mmrTopK(df, "id", "v", q, k = 4, poolSize = 4)
      .select("id").as[Long].collect().toSeq
    assert(out == Seq(1L, 4L), s"unscorable rows must be skipped, got $out")
    // string ids refuse up front (the knnJoin contract, now shared)
    val strIds = Seq(("a", Seq(1.0f, 0.0f))).toDF("id", "v")
      .select(col("id"), col("v").cast("array<float>").as("v"))
    intercept[IllegalArgumentException](
      Similarity.mmrTopK(strIds, "id", "v", q, k = 1))
    // a negative id must win an exact tie against a larger positive id
    // (the -1 "unset" sentinel used to conflate with real negative ids)
    val neg = Seq(
      (-10L, Seq(0.6f, 0.0f)),
      (5L, Seq(0.6f, 0.0f)))
      .toDF("id", "v").select(col("id"), col("v").cast("array<float>").as("v"))
    val first = Similarity.mmrTopK(neg, "id", "v", q, k = 1, poolSize = 2)
      .select("id").as[Long].collect().head
    assert(first == -10L, s"smaller id must win the tie, got $first")
  }

  test("quantizedOutliers flags unscorable (corrupt) rows instead of passing them") {
    val centroids = Array(0f, 0f)
    val df = Seq(
      (1L, Seq(0.1f, 0.1f)),        // near the centroid: clean
      (2L, Seq(50f, 50f)),          // far: flagged by distance
      (3L, Seq(1f, 2f, 3f)))        // wrong dim: codes can't score it
      .toDF("id", "v").select(col("id"), col("v").cast("array<float>").as("v"))
    val flagged = Similarity
      .quantizedOutliers(df, "id", "v", centroids, dim = 2, maxCodeDistSq = 1000L)
      .select("id", "min_code_dist").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(flagged.keySet == Set(2L, 3L), s"got ${flagged.keySet}")
    assert(flagged(3L).isEmpty, "corrupt row flags with a null distance marker")
    assert(flagged(2L).nonEmpty)
  }

  test("probeCellsCosine refuses a wrong-dim query; zero-norm cells rank last") {
    val cents = Array(
      1f, 0f,    // cell 0: cos +1 to the query
      0f, 0f,    // cell 1: zero-norm (degenerate)
      -1f, 0f)   // cell 2: cos -1
    intercept[IllegalArgumentException](
      Similarity.probeCellsCosine(Array(1f, 0f, 0f), cents, 2, 1))
    // the negative-similarity cell must outrank the zero-norm one (the
    // IvfIndex rule; scoring zero-norm 0.0 used to rank it mid-field)
    val order = Similarity.probeCellsCosine(Array(1f, 0f), cents, 2, 3).toSeq
    assert(order == Seq(0, 2, 1), s"got $order")
  }
}
