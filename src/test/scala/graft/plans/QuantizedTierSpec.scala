package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Sort
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.ivf.{IndexStore, IvfBuilder, PqSidecar, Sq8Sidecar}

/** `spark.graft.ivf.tier`: the SQL rewrite's winner feed routed through the
  * quantized code sidecars. Exhaustive probe + covering oversample makes
  * every tier exact (coarse keeps the whole corpus, refine is exact float
  * space), so each tier's result must equal brute force; the TierTag on the
  * rewritten Sort makes fired-vs-fell-back observable.
  */
class QuantizedTierSpec extends SparkSpec {

  private lazy val storeDir = Files.createTempDirectory("graft-tier-store").toString
  private lazy val store = new IndexStore(storeDir)
  private lazy val dataDir: String = {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val dir = Files.createTempDirectory("graft-tier-data").toString
    (0 until 200).map(i => (i.toLong, Seq.fill(8)(rnd.nextFloat())))
      .toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    IvfBuilder.build(spark, dir, IvfBuilder.Config("vec", nClusters = Some(8)), store)
    Sq8Sidecar.ensure(spark, dir, "vec", store)
    PqSidecar.ensure(spark, dir, "vec", m = 4, store)
    PqSidecar.ensure(spark, dir, "vec", m = 4, store, residual = true)
    dir
  }

  /** IVF-indexed but NO code sidecars — the fallback fixture. */
  private lazy val bareDir: String = {
    import spark.implicits._
    val rnd = new scala.util.Random(18)
    val dir = Files.createTempDirectory("graft-tier-bare").toString
    (0 until 100).map(i => (i.toLong, Seq.fill(8)(rnd.nextFloat())))
      .toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    IvfBuilder.build(spark, dir, IvfBuilder.Config("vec", nClusters = Some(8)), store)
    dir
  }

  private def withTier[T](tier: String, oversample: Int = 64)(body: => T): T = {
    graft.Graft.install(spark)
    spark.conf.set(VectorTopKRule.IndexDirKey, storeDir)
    spark.conf.set(VectorTopKRule.NprobeKey, "8") // = nClusters → exhaustive
    spark.conf.set(VectorTopKRule.TierKey, tier)
    // covering: k·oversample = 5·64 ≥ 200-row corpus → refine sees all
    spark.conf.set(VectorTopKRule.OversampleKey, oversample.toString)
    try body
    finally {
      spark.conf.set(VectorTopKRule.EnabledKey, "true")
      spark.conf.unset(VectorTopKRule.NprobeKey)
      spark.conf.unset(VectorTopKRule.TierKey)
      spark.conf.unset(VectorTopKRule.OversampleKey)
    }
  }

  private def sqlTopk(view: String, order: String = "ASC", fn: String = "array_distance"): DataFrame =
    spark.sql(
      s"""SELECT id FROM $view
         |ORDER BY $fn(vec, array(${Seq.fill(8)("0.5F").mkString(",")})) $order
         |LIMIT 5""".stripMargin)

  private def tierOf(df: DataFrame): Option[String] =
    df.queryExecution.optimizedPlan
      .collect { case s: Sort => s.getTagValue(VectorTopKRule.TierTag) }
      .flatten.headOption

  private def bruteIds(view: String, order: String = "ASC", fn: String = "array_distance"): Seq[Long] = {
    spark.conf.set(VectorTopKRule.EnabledKey, "false")
    try sqlTopk(view, order, fn).collect().map(_.getLong(0)).toSeq
    finally spark.conf.set(VectorTopKRule.EnabledKey, "true")
  }

  private def register(): Unit = {
    spark.read.parquet(dataDir).createOrReplaceTempView("tier_vecs")
    spark.read.parquet(bareDir).createOrReplaceTempView("tier_bare")
  }

  test("tier=sq8 engages the code-sidecar feed and stays exact at covering settings") {
    register()
    withTier("sq8") {
      val df = sqlTopk("tier_vecs")
      assert(tierOf(df).contains("sq8"), s"tier tag: ${tierOf(df)}")
      assert(df.collect().map(_.getLong(0)).toSeq == bruteIds("tier_vecs"))
    }
  }

  test("tier=pq and tier=pqr engage and stay exact at covering settings") {
    register()
    withTier("pq") {
      val df = sqlTopk("tier_vecs")
      assert(tierOf(df).contains("pq"), s"tier tag: ${tierOf(df)}")
      assert(df.collect().map(_.getLong(0)).toSeq == bruteIds("tier_vecs"))
    }
    withTier("pqr") {
      val df = sqlTopk("tier_vecs")
      assert(tierOf(df).contains("pqr"), s"tier tag: ${tierOf(df)}")
      assert(df.collect().map(_.getLong(0)).toSeq == bruteIds("tier_vecs"))
    }
  }

  test("tier=auto: float on the warm profile, best sidecar tier on cold, float when bare") {
    register()
    withTier("auto") {
      // warm (the default profile): float selective is the measured winner
      val warm = sqlTopk("tier_vecs")
      assert(tierOf(warm).contains("float"), s"tier tag: ${tierOf(warm)}")
      assert(warm.collect().map(_.getLong(0)).toSeq == bruteIds("tier_vecs"))
      spark.conf.set(VectorTopKRule.StorageProfileKey, "cold")
      try {
        // cold: best available tier — dataDir carries residual sidecars
        val cold = sqlTopk("tier_vecs")
        assert(tierOf(cold).contains("pqr"), s"tier tag: ${tierOf(cold)}")
        assert(cold.collect().map(_.getLong(0)).toSeq == bruteIds("tier_vecs"))
        // cold but no sidecars anywhere: float fallback, still accelerated
        val bare = sqlTopk("tier_bare")
        assert(tierOf(bare).contains("float"), s"tier tag: ${tierOf(bare)}")
        assert(bare.collect().map(_.getLong(0)).toSeq == bruteIds("tier_bare"))
        // a typo'd profile is refused, not silently warm
        spark.conf.set(VectorTopKRule.StorageProfileKey, "frozen")
        intercept[Exception](sqlTopk("tier_vecs").collect())
      } finally spark.conf.unset(VectorTopKRule.StorageProfileKey)
    }
  }

  private def reasonOf(df: DataFrame): Option[String] =
    df.queryExecution.optimizedPlan
      .collect { case s: Sort => s.getTagValue(VectorTopKRule.TierReasonTag) }
      .flatten.headOption

  test("the resolved tier and WHY are surfaced on the plan (TierReasonTag)") {
    register()
    withTier("auto") {
      // warm profile: float, reason names the profile
      val warm = reasonOf(sqlTopk("tier_vecs")).getOrElse(fail("no reason tag"))
      assert(warm.contains("requested=auto") && warm.contains("resolved=float")
        && warm.contains("profile=warm"), warm)
      spark.conf.set(VectorTopKRule.StorageProfileKey, "cold")
      try {
        // cold + usable residual sidecars: resolves pqr, reason says so
        val cold = reasonOf(sqlTopk("tier_vecs")).getOrElse(fail("no reason tag"))
        assert(cold.contains("requested=auto") && cold.contains("resolved=pqr"), cold)
        // the misconfiguration the tag exists for: cold profile, nothing
        // usable — silently-float must be VISIBLE with an actionable hint
        val bare = reasonOf(sqlTopk("tier_bare")).getOrElse(fail("no reason tag"))
        assert(bare.contains("resolved=float")
          && bare.contains("no usable quantized sidecar"), bare)
      } finally spark.conf.unset(VectorTopKRule.StorageProfileKey)
    }
    // an explicitly requested tier with no sidecar: reason names the gap
    withTier("sq8") {
      val r = reasonOf(sqlTopk("tier_bare")).getOrElse(fail("no reason tag"))
      assert(r.contains("requested=sq8") && r.contains("resolved=float")
        && r.contains("absent/stale"), r)
    }
    // engaged tier: reason records the clean resolution, and the public
    // Graft.tierResolution read returns the same string
    withTier("pq") {
      val df = sqlTopk("tier_vecs")
      val r = reasonOf(df).getOrElse(fail("no reason tag"))
      assert(r == "requested=pq resolved=pq", r)
      assert(graft.Graft.tierResolution(df).contains(r))
    }
    // a non-vector query has no resolution to report
    assert(graft.Graft.tierResolution(
      spark.sql("SELECT id FROM tier_vecs ORDER BY id LIMIT 3")).isEmpty)
  }

  test("missing code sidecars fall back to the float feed, still accelerated and exact") {
    register()
    withTier("pq") {
      val df = sqlTopk("tier_bare")
      assert(tierOf(df).contains("float"), s"tier tag: ${tierOf(df)}")
      assert(df.collect().map(_.getLong(0)).toSeq == bruteIds("tier_bare"))
    }
    withTier("sq8") {
      val df = sqlTopk("tier_bare")
      assert(tierOf(df).contains("float"), s"tier tag: ${tierOf(df)}")
    }
  }

  test("cosine queries ride the sq8 tier (angular probe + code-grid coarse), exact at covering settings") {
    register()
    withTier("sq8") {
      val df = sqlTopk("tier_vecs", order = "DESC", fn = "array_cosine_similarity")
      assert(tierOf(df).contains("sq8"), s"tier tag: ${tierOf(df)}")
      assert(df.collect().map(_.getLong(0)).toSeq ==
        bruteIds("tier_vecs", "DESC", "array_cosine_similarity"))
    }
  }

  test("cosine queries ride the pq/pqr tiers (reconstruction-cosine coarse), exact at covering settings") {
    register()
    for (tier <- Seq("pq", "pqr")) withTier(tier) {
      val df = sqlTopk("tier_vecs", order = "DESC", fn = "array_cosine_similarity")
      assert(tierOf(df).contains(tier), s"tier=$tier tag: ${tierOf(df)}")
      assert(df.collect().map(_.getLong(0)).toSeq ==
        bruteIds("tier_vecs", "DESC", "array_cosine_similarity"))
    }
  }

  private def withFilteredTier[T](tier: String)(body: => T): T = {
    spark.conf.set(VectorTopKRule.FilteredTierKey, "true")
    try withTier(tier)(body)
    finally spark.conf.unset(VectorTopKRule.FilteredTierKey)
  }

  private def sqlTopkFiltered(
      view: String, order: String = "ASC", fn: String = "array_distance"): DataFrame =
    spark.sql(
      s"""SELECT id FROM $view
         |WHERE id % 3 = 0
         |ORDER BY $fn(vec, array(${Seq.fill(8)("0.5F").mkString(",")})) $order
         |LIMIT 5""".stripMargin)

  private def bruteFilteredIds(
      view: String, order: String = "ASC", fn: String = "array_distance"): Seq[Long] = {
    spark.conf.set(VectorTopKRule.EnabledKey, "false")
    try sqlTopkFiltered(view, order, fn).collect().map(_.getLong(0)).toSeq
    finally spark.conf.set(VectorTopKRule.EnabledKey, "true")
  }

  test("a residual Filter ignores the tier unless filteredTier opts in (exact float fallback)") {
    register()
    withTier("sq8") {
      val df = sqlTopkFiltered("tier_vecs")
      assert(tierOf(df).contains("float"), s"tier tag: ${tierOf(df)}")
      assert(df.collect().map(_.getLong(0)).toSeq == bruteFilteredIds("tier_vecs"))
    }
  }

  test("filteredTier=true engages the tiers under a Filter, exact at covering settings") {
    register()
    for (tier <- Seq("sq8", "pq", "pqr")) withFilteredTier(tier) {
      val df = sqlTopkFiltered("tier_vecs")
      assert(tierOf(df).contains(tier), s"tier=$tier tag: ${tierOf(df)}")
      assert(df.collect().map(_.getLong(0)).toSeq == bruteFilteredIds("tier_vecs"),
        s"tier=$tier filtered result diverged at covering settings")
    }
    // angular twin: the filtered cosine staple rides the tier too
    withFilteredTier("sq8") {
      val df = sqlTopkFiltered("tier_vecs", "DESC", "array_cosine_similarity")
      assert(tierOf(df).contains("sq8"), s"tier tag: ${tierOf(df)}")
      assert(df.collect().map(_.getLong(0)).toSeq ==
        bruteFilteredIds("tier_vecs", "DESC", "array_cosine_similarity"))
    }
  }

  test("filteredTier=true with no code sidecars falls back to the full candidate feed, exact") {
    register()
    withFilteredTier("pq") {
      val df = sqlTopkFiltered("tier_bare")
      assert(tierOf(df).contains("float"), s"tier tag: ${tierOf(df)}")
      assert(df.collect().map(_.getLong(0)).toSeq == bruteFilteredIds("tier_bare"))
    }
  }

  test("an unknown tier name is refused, not silently float") {
    register()
    withTier("pq16") {
      val e = intercept[Exception](sqlTopk("tier_vecs").collect())
      assert(e.getMessage.contains("must be one of"), e.getMessage)
    }
  }
}
