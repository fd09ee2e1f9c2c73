package graft.ops

import org.apache.spark.sql.functions.col

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
      .ivfCellPairs(spark, clustered, "id", "v", centroids, 4, threshold = 0.99)
      .as[(Long, Long)].collect().toSet
    // all within-cluster pairs (cos ~ 1), no cross-cluster pairs (cos ~ -1)
    assert(pairs.size == 2 * (10 * 9 / 2))
    assert(pairs.forall { case (a, b) => (a < 10) == (b < 10) })
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

  test("cosineTopK ranks by similarity descending") {
    val top = Similarity
      .cosineTopK(clustered, "v", Seq(1f, 1f, 1f, 1f), 5)
      .select("id").as[Long].collect()
    assert(top.forall(_ < 10))
  }
}
