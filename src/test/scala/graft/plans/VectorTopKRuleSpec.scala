package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.ivf.{IndexStore, IvfBuilder}

/** Plan-shape and semantics tests for the SQL-transparent topk rewrite —
  * the Spark analog of the reference's snapshot plan tests (the `.snap`
  * files under `/root/reference/src/df_vector/snapshots/`).
  */
class VectorTopKRuleSpec extends SparkSpec {

  private lazy val storeDir = Files.createTempDirectory("graft-rule-store").toString
  private lazy val dataDir: String = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val dir = Files.createTempDirectory("graft-rule-data").toString
    (0 until 200).map(i => (i.toLong, Seq.fill(8)(rnd.nextFloat()), i % 4))
      .toDF("id", "vec", "label")
      .select(col("id"), col("vec").cast("array<float>").as("vec"), col("label"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    IvfBuilder.build(spark, dir,
      IvfBuilder.Config("vec", nClusters = Some(8)), new IndexStore(storeDir))
    dir
  }

  private def withRule[T](nprobe: Int)(body: => T): T = {
    graft.Graft.install(spark)
    spark.conf.set(VectorTopKRule.IndexDirKey, storeDir)
    spark.conf.set(VectorTopKRule.NprobeKey, nprobe.toString)
    // range tests assert plan shape — pin the selectivity bailout off so
    // firing is a function of the predicate, not the random fixture
    spark.conf.set(VectorTopKRule.RangeMaxSelectivityKey, "1.0")
    try body
    finally {
      spark.conf.set(VectorTopKRule.EnabledKey, "true")
      spark.conf.unset(VectorTopKRule.NprobeKey)
      spark.conf.unset(VectorTopKRule.RangeMaxSelectivityKey)
    }
  }

  private def sqlTopk(extra: String = "", order: String = "ASC"): DataFrame =
    spark.sql(
      s"""SELECT id FROM graft_vecs $extra
         |ORDER BY array_distance(vec, array(${Seq.fill(8)("0.5F").mkString(",")})) $order
         |LIMIT 5""".stripMargin)

  private def register(): Unit =
    spark.read.parquet(dataDir).createOrReplaceTempView("graft_vecs")

  private def fired(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.toString.contains("LeftSemi")

  test("rewrite fires on ORDER BY array_distance ASC LIMIT k and stays exact") {
    register()
    withRule(nprobe = 8) { // nprobe = nClusters → exhaustive → exact
      val df = sqlTopk()
      assert(fired(df), df.queryExecution.optimizedPlan.toString)
      // filter-free → winner-first feed: the build side is the phase-1
      // top-k over selective reads, not the full candidate scan
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("_dist"), optimized)
      assert(!optimized.contains("IvfCandidateScan"), optimized)
      spark.conf.set(VectorTopKRule.EnabledKey, "false")
      val brute = sqlTopk()
      assert(!fired(brute))
      assert(df.collect().map(_.getLong(0)).toSeq ==
        brute.collect().map(_.getLong(0)).toSeq)
    }
  }

  test("twoPhase=false forces the one-phase candidate feed and stays exact") {
    register()
    withRule(nprobe = 8) {
      spark.conf.set(VectorTopKRule.TwoPhaseKey, "false")
      try {
        val df = sqlTopk()
        assert(fired(df), df.queryExecution.optimizedPlan.toString)
        // candidate feed is the metered custom node, planned by GraftStrategy
        assert(df.queryExecution.optimizedPlan.toString.contains("IvfCandidateScan"))
        assert(df.queryExecution.executedPlan.toString.contains("IvfCandidateScanExec"))
        spark.conf.set(VectorTopKRule.EnabledKey, "false")
        val brute = sqlTopk()
        spark.conf.set(VectorTopKRule.EnabledKey, "true")
        assert(df.collect().map(_.getLong(0)).toSeq ==
          brute.collect().map(_.getLong(0)).toSeq)
      } finally spark.conf.unset(VectorTopKRule.TwoPhaseKey)
    }
  }

  test("residual WHERE keeps the one-phase candidate feed (post-filter)") {
    register()
    withRule(nprobe = 8) {
      val df = sqlTopk(extra = "WHERE label >= 2")
      assert(fired(df))
      // a filter below the top-k must see full candidate rows — the
      // winner-first shortcut must NOT engage
      assert(df.queryExecution.optimizedPlan.toString.contains("IvfCandidateScan"))
    }
  }

  test("residual WHERE composes post-pruning and pushes into the pruned scan") {
    register()
    withRule(nprobe = 8) {
      val df = sqlTopk(extra = "WHERE label >= 2")
      assert(fired(df))
      spark.conf.set(VectorTopKRule.EnabledKey, "false")
      val brute = sqlTopk(extra = "WHERE label >= 2")
      assert(df.collect().map(_.getLong(0)).toSeq ==
        brute.collect().map(_.getLong(0)).toSeq)
      // predicate survives the rewrite down to a scan (pushed filters)
      val physical = df.queryExecution.executedPlan.toString
      assert(physical.contains("label"), physical)
    }
  }

  test("ANN mode: small nprobe returns a subset ranked consistently") {
    register()
    withRule(nprobe = 2) {
      val ann = sqlTopk()
      assert(fired(ann))
      val annIds = ann.collect().map(_.getLong(0)).toSeq
      assert(annIds.nonEmpty && annIds.length <= 5)
    }
  }

  test("maxCandidates conf caps the fetched candidate set, winner-first") {
    register()
    withRule(nprobe = 8) {
      spark.conf.set(VectorTopKRule.MaxCandidatesKey, "2")
      try {
        val df = sqlTopk()
        assert(fired(df))
        // the cap no longer forces one-phase: filter-free keeps the
        // winner-first feed, with round-robin capping inside the plan
        val optimized = df.queryExecution.optimizedPlan.toString
        assert(!optimized.contains("IvfCandidateScan"), optimized)
        assert(optimized.contains("_pos"), optimized)
        // 200 rows, exhaustive probe, but only 2 candidates survive the cap
        assert(df.collect().length == 2)

        // semantic twin: the one-phase path (twoPhase=false) must select
        // the SAME round-robin-capped candidate set
        spark.conf.set(VectorTopKRule.TwoPhaseKey, "false")
        val onePhase = sqlTopk()
        assert(onePhase.queryExecution.optimizedPlan.toString
          .contains("IvfCandidateScan"))
        assert(df.collect().map(_.getLong(0)).sorted.toSeq ==
          onePhase.collect().map(_.getLong(0)).sorted.toSeq)
      } finally {
        spark.conf.unset(VectorTopKRule.MaxCandidatesKey)
        spark.conf.unset(VectorTopKRule.TwoPhaseKey)
      }
    }
  }

  test("maxCandidates with a residual WHERE still caps via one-phase") {
    register()
    withRule(nprobe = 8) {
      spark.conf.set(VectorTopKRule.MaxCandidatesKey, "4")
      try {
        val df = sqlTopk(extra = "WHERE label >= 0")
        assert(fired(df))
        assert(df.queryExecution.optimizedPlan.toString.contains("IvfCandidateScan"))
        assert(df.collect().length == 4)
      } finally spark.conf.unset(VectorTopKRule.MaxCandidatesKey)
    }
  }

  private def sqlCosineTopk(extra: String = "", order: String = "DESC"): DataFrame =
    spark.sql(
      s"""SELECT id FROM graft_vecs $extra
         |ORDER BY array_cosine_similarity(vec, array(${Seq.fill(8)("0.5F").mkString(",")})) $order
         |LIMIT 5""".stripMargin)

  test("cosine DESC rewrites via the angular winner-first feed and stays exact") {
    register()
    withRule(nprobe = 8) { // exhaustive → exact regardless of probe order
      val df = sqlCosineTopk()
      assert(fired(df), df.queryExecution.optimizedPlan.toString)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("_dist"), optimized)
      assert(!optimized.contains("IvfCandidateScan"), optimized)
      spark.conf.set(VectorTopKRule.EnabledKey, "false")
      val brute = sqlCosineTopk()
      assert(!fired(brute))
      assert(df.collect().map(_.getLong(0)).toSeq ==
        brute.collect().map(_.getLong(0)).toSeq)
    }
  }

  test("no cosine rewrite for ASC (least-similar-first has no probe order)") {
    register()
    withRule(nprobe = 8) {
      assert(!fired(sqlCosineTopk(order = "ASC")))
    }
  }

  test("filtered cosine rewrites via the ANGULAR one-phase feed and stays exact") {
    register()
    withRule(nprobe = 8) { // exhaustive → both probe orders emit every row
      val df = sqlCosineTopk(extra = "WHERE label >= 2")
      assert(fired(df), df.queryExecution.optimizedPlan.toString)
      // post-filter semantics need the full candidate feed, probed angularly
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("IvfCandidateScan"), optimized)
      assert(optimized.contains("metric=cosine"), optimized)
      spark.conf.set(VectorTopKRule.EnabledKey, "false")
      val brute = sqlCosineTopk(extra = "WHERE label >= 2")
      assert(!fired(brute))
      spark.conf.set(VectorTopKRule.EnabledKey, "true")
      assert(df.collect().map(_.getLong(0)).toSeq ==
        brute.collect().map(_.getLong(0)).toSeq)

      // twoPhase=false: filter-free cosine also drops to the angular
      // one-phase feed instead of bailing
      spark.conf.set(VectorTopKRule.TwoPhaseKey, "false")
      try {
        val one = sqlCosineTopk()
        assert(fired(one), one.queryExecution.optimizedPlan.toString)
        assert(one.queryExecution.optimizedPlan.toString.contains("metric=cosine"))
        spark.conf.set(VectorTopKRule.EnabledKey, "false")
        val b2 = sqlCosineTopk()
        spark.conf.set(VectorTopKRule.EnabledKey, "true")
        assert(one.collect().map(_.getLong(0)).toSeq ==
          b2.collect().map(_.getLong(0)).toSeq)
      } finally spark.conf.unset(VectorTopKRule.TwoPhaseKey)
    }
  }

  test("ANN filtered cosine at small nprobe probes the angular neighborhood") {
    register()
    withRule(nprobe = 2) {
      val df = sqlCosineTopk(extra = "WHERE label >= 2")
      assert(fired(df))
      val ids = df.collect().map(_.getLong(0)).toSeq
      assert(ids.nonEmpty && ids.length <= 5)
    }
  }

  test("capped filtered cosine: angular one-phase feed honors maxCandidates") {
    register()
    withRule(nprobe = 8) {
      spark.conf.set(VectorTopKRule.MaxCandidatesKey, "4")
      try {
        val df = sqlCosineTopk(extra = "WHERE label >= 0") // filter keeps all
        assert(fired(df))
        val optimized = df.queryExecution.optimizedPlan.toString
        assert(optimized.contains("metric=cosine"), optimized)
        // exhaustive probe over 200 rows, but only 4 candidates survive
        assert(df.collect().length == 4)
      } finally spark.conf.unset(VectorTopKRule.MaxCandidatesKey)
    }
  }

  test("DSv2 filtered cosine also rewrites via the angular one-phase feed") {
    import graft.functions.{array_cosine_similarity, float_vector}
    withRule(nprobe = 8) {
      val prev = spark.conf.get("spark.sql.sources.useV1SourceList")
      spark.conf.set("spark.sql.sources.useV1SourceList", "")
      try {
        def q = spark.read.parquet(dataDir)
          .where(col("label") >= 2)
          .orderBy(
            array_cosine_similarity(col("vec"), float_vector(Seq.fill(8)(0.5f))).desc)
          .limit(5)
          .select("id")
        val df = q
        assert(fired(df), df.queryExecution.optimizedPlan.toString)
        assert(df.queryExecution.optimizedPlan.toString.contains("metric=cosine"))
        spark.conf.set(VectorTopKRule.EnabledKey, "false")
        val brute = q
        assert(!fired(brute))
        spark.conf.set(VectorTopKRule.EnabledKey, "true")
        assert(df.collect().map(_.getLong(0)).toSeq ==
          brute.collect().map(_.getLong(0)).toSeq)
      } finally spark.conf.set("spark.sql.sources.useV1SourceList", prev)
    }
  }

  test("no rewrite for DESC, multiple sort keys, or unindexed columns") {
    register()
    withRule(nprobe = 8) {
      assert(!fired(sqlTopk(order = "DESC")))
      val multi = spark.sql(
        s"""SELECT id FROM graft_vecs
           |ORDER BY array_distance(vec, array(${Seq.fill(8)("0.5F").mkString(",")})), id
           |LIMIT 5""".stripMargin)
      assert(!fired(multi))
      // unindexed: point the rule at an empty index dir
      spark.conf.set(VectorTopKRule.IndexDirKey,
        Files.createTempDirectory("graft-empty").toString)
      assert(!fired(sqlTopk()))
    }
  }

  test("no rewrite when an aggregate sits between sort and scan") {
    register()
    withRule(nprobe = 8) {
      val agg = spark.sql(
        s"""SELECT first(vec) AS v, count(*) AS n FROM graft_vecs GROUP BY label
           |ORDER BY array_distance(first(vec), array(${Seq.fill(8)("0.5F").mkString(",")}))
           |LIMIT 2""".stripMargin)
      assert(!fired(agg))
    }
  }

  test("DSv2 parquet scan (useV1SourceList='') also rewrites and stays exact") {
    import graft.functions.{array_distance, float_vector}
    withRule(nprobe = 8) {
      val prev = spark.conf.get("spark.sql.sources.useV1SourceList")
      spark.conf.set("spark.sql.sources.useV1SourceList", "")
      try {
        def topk = spark.read.parquet(dataDir)
          .orderBy(array_distance(col("vec"), float_vector(Seq.fill(8)(0.5f))).asc)
          .limit(5)
          .select("id")
        val df = topk
        // confirm the plan really is on the V2 path, then that we fired
        val optimized = df.queryExecution.optimizedPlan.toString
        assert(!optimized.contains("HadoopFsRelation") || fired(df), optimized)
        assert(fired(df), optimized)
        spark.conf.set(VectorTopKRule.EnabledKey, "false")
        val brute = topk
        assert(!fired(brute))
        spark.conf.set(VectorTopKRule.EnabledKey, "true")
        assert(df.collect().map(_.getLong(0)).toSeq ==
          brute.collect().map(_.getLong(0)).toSeq)

        // a residual filter on the V2 path keeps post-filter semantics
        def filtered = spark.read.parquet(dataDir)
          .where(col("label") >= 2)
          .orderBy(array_distance(col("vec"), float_vector(Seq.fill(8)(0.5f))).asc)
          .limit(5)
          .select("id")
        val fdf = filtered
        assert(fired(fdf), fdf.queryExecution.optimizedPlan.toString)
        spark.conf.set(VectorTopKRule.EnabledKey, "false")
        val fbrute = filtered
        spark.conf.set(VectorTopKRule.EnabledKey, "true")
        assert(fdf.collect().map(_.getLong(0)).toSeq ==
          fbrute.collect().map(_.getLong(0)).toSeq)
      } finally spark.conf.set("spark.sql.sources.useV1SourceList", prev)
    }
  }

  test("Column-API query with float_vector literal also rewrites") {
    withRule(nprobe = 8) {
      import graft.functions.{array_distance, float_vector}
      val df = spark.read.parquet(dataDir)
        .orderBy(array_distance(col("vec"), float_vector(Seq.fill(8)(0.5f))).asc)
        .limit(5)
        .select("id")
      assert(fired(df), df.queryExecution.optimizedPlan.toString)
    }
  }

  private def vecLit: String = s"array(${Seq.fill(8)("0.5F").mkString(",")})"

  private def sqlRange(pred: String): DataFrame =
    spark.sql(s"SELECT id FROM graft_vecs WHERE $pred")

  test("range WHERE rewrites to a pruned semi-join and stays exact") {
    register()
    withRule(nprobe = 8) {
      val pred = s"array_distance(vec, $vecLit) < 0.55"
      val df = sqlRange(pred)
      assert(fired(df), df.queryExecution.optimizedPlan.toString)
      spark.conf.set(VectorTopKRule.RangeEnabledKey, "false")
      try {
        val brute = sqlRange(pred)
        assert(!fired(brute))
        val expected = brute.collect().map(_.getLong(0)).sorted.toSeq
        assert(expected.nonEmpty, "fixture radius catches no rows")
        assert(df.collect().map(_.getLong(0)).sorted.toSeq == expected)
      } finally spark.conf.unset(VectorTopKRule.RangeEnabledKey)
    }
  }

  test("range rewrite fires for flipped, <=, squared, and conjunct forms") {
    register()
    withRule(nprobe = 8) {
      val forms = Seq(
        s"0.55 > array_distance(vec, $vecLit)",
        s"array_distance(vec, $vecLit) <= 0.55",
        s"array_squared_l2(vec, $vecLit) < 0.3",
        s"label >= 0 AND array_distance(vec, $vecLit) < 0.55")
      forms.foreach { pred =>
        val df = sqlRange(pred)
        assert(fired(df), s"$pred: ${df.queryExecution.optimizedPlan}")
        spark.conf.set(VectorTopKRule.RangeEnabledKey, "false")
        val brute = sqlRange(pred)
        spark.conf.unset(VectorTopKRule.RangeEnabledKey)
        assert(df.collect().map(_.getLong(0)).sorted.toSeq ==
          brute.collect().map(_.getLong(0)).sorted.toSeq, pred)
      }
    }
  }

  test("selectivity bailout: a barely-pruning radius keeps the plain scan") {
    register()
    withRule(nprobe = 8) {
      // radius covering everything → candidate fraction 1.0 > 0.5 default
      spark.conf.set(VectorTopKRule.RangeMaxSelectivityKey, "0.5")
      val wide = sqlRange(s"array_distance(vec, $vecLit) < 100.0")
      assert(!fired(wide), wide.queryExecution.optimizedPlan.toString)
      // and the result is still the plain-filter answer
      assert(wide.count() == 200)
    }
  }

  test("no range rewrite for non-literal radius, upper bounds, or unindexed columns") {
    register()
    withRule(nprobe = 8) {
      // radius from a column — not a constant bound
      assert(!fired(sqlRange(s"array_distance(vec, $vecLit) < cast(label AS FLOAT)")))
      // farthest-first has no triangle bound
      assert(!fired(sqlRange(s"array_distance(vec, $vecLit) > 0.55")))
      // unindexed table
      import spark.implicits._
      val plainDir = java.nio.file.Files.createTempDirectory("graft-rule-plain").toString
      (0 until 20).map(i => (i.toLong, Seq.fill(8)(i.toFloat)))
        .toDF("id", "vec")
        .select(col("id"), col("vec").cast("array<float>").as("vec"))
        .write.mode("overwrite").parquet(plainDir)
      spark.read.parquet(plainDir).createOrReplaceTempView("graft_plain")
      assert(!fired(spark.sql(
        s"SELECT id FROM graft_plain WHERE array_distance(vec, $vecLit) < 0.5")))
    }
  }
}
