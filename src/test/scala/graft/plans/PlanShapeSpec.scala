package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Structural plan guards for the 100 TB design goals: these assert the
  * SHAPE of the plans (what shuffles, what broadcasts, what would go
  * quadratic), not timings — the properties that must survive a 1000×
  * scale-up. Runs on the small testdata; plan shape is scale-invariant.
  */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def available: Boolean = new java.io.File(s"$sf/documents.parquet").exists()
  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("text analysis runs as a pure projection — zero exchanges") {
    assume(available)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.ops.TextAnalysis.qualityFeatures(docs, "doc_id", "text"))
    assert(!p.contains("Exchange"), p)
    val p2 = plan(docs.select(graft.ops.TextAnalysis.langId(col("text"))))
    assert(!p2.contains("Exchange"), p2)
  }

  test("near-dup candidate generation never plans a cartesian or nested-loop join") {
    assume(available)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    Seq(
      graft.ops.Dedup.minhashNearDupPairs(docs, "doc_id", "text"),
      graft.ops.Dedup.simhashNearDupPairs(docs, "doc_id", "text"),
      graft.ops.Dedup.invertedIndexNearDupPairs(docs, "doc_id", "text")
    ).foreach { df =>
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), p.take(2000))
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    }
  }

  test("q5 region revenue broadcasts the fixed dims, no quadratic joins") {
    assume(available)
    val p = plan(graft.Queries.q5RegionRevenue(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
  }

  test("bucketed cell pairs join on the cell key (hash join, no ScalaUDF)") {
    assume(available)
    import spark.implicits._
    val vecs = (0 until 50).map(i => (i.toLong, Seq.fill(4)(i.toFloat)))
      .toDF("id", "v").select(col("id"), col("v").cast("array<float>").as("v"))
    val centroids = Array(0f, 0f, 0f, 0f, 25f, 25f, 25f, 25f)
    val p = plan(graft.ops.Similarity.ivfCellPairs(vecs, "id", "v", centroids, 4, 0.5))
    assert(!p.contains("ScalaUDF"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
  }

  test("corpus packing windows are shard-partitioned, not global") {
    assume(available)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = graft.ops.Corpus.packByBudget(
      docs, "doc_id", graft.ops.TextAnalysis.tokenCount(col("text")).cast("bigint"), 200L)
    // a global window would plan a single-partition exchange
    assert(!plan(df).contains("SinglePartition"), plan(df).take(2000))
  }
}
