package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // one hot key (0) holding 90% of the big side
  private lazy val big = ((1L to 900L).map(_ => 0L) ++ (1L to 100L).map(_ % 10))
    .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "row_id")
  private lazy val small = (0L until 10L).map(i => (i, s"v$i")).toDF("sk", "v")

  test("saltedJoin equals the plain join (inner)") {
    val plain = big.join(small, big("k") === small("sk")).drop("sk")
      .as[(Long, Long, String)].collect().toSet
    val salted = Skew.saltedJoin(big, small, "k", "sk", salts = 8).drop("sk")
      .as[(Long, Long, String)].collect().toSet
    assert(salted == plain)
    assert(salted.size == 1000)
  }

  test("saltedJoin preserves left-join misses") {
    val sparse = small.where(col("sk") >= 5)
    val plain = big.join(sparse, big("k") === sparse("sk"), "left").drop("sk")
      .as[(Long, Long, Option[String])].collect().toSet
    val salted = Skew.saltedJoin(big, sparse, "k", "sk", 4, "left").drop("sk")
      .as[(Long, Long, Option[String])].collect().toSet
    assert(salted == plain)
    // the hot key 0 misses: its rows survive exactly once with null v
    assert(salted.count(_._3.isEmpty) == plain.count(_._3.isEmpty))
  }

  // --- r11 review regressions ---

  test("saltedJoin semi/anti equal the plain join; salt is content-stable") {
    val big = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d")).toDF("k", "v")
    val small = Seq((1L, "x"), (3L, "y")).toDF("sk", "sv")
    val semi = Skew.saltedJoin(big, small, "k", "sk", 4, "left_semi")
      .as[(Long, String)].collect().toSet
    assert(semi == big.join(small, col("k") === col("sk"), "left_semi")
      .as[(Long, String)].collect().toSet)
    val anti = Skew.saltedJoin(big, small, "k", "sk", 4, "left_anti")
      .as[(Long, String)].collect().toSet
    assert(anti == Set((2L, "c")))
    intercept[IllegalArgumentException](
      Skew.saltedJoin(big, small, "k", "sk", 4, "full_outer"))
    // the salt must be a pure function of row content (recomputation-
    // stable under stage retries), so any repartitioning yields the
    // identical join output row multiset
    val a = Skew.saltedJoin(big, small, "k", "sk", 3)
      .collect().map(_.toString).sorted.toSeq
    val b = Skew.saltedJoin(big.repartition(7), small, "k", "sk", 3)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("saltedJoin tolerates unhashable (map) big-side columns") {
    // xxhash64 rejects MapType at analysis time — the content salt must
    // hash only the hashable columns, not fail the whole join (r12 advice)
    val mapped = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
      .withColumn("attrs", map(col("v"), col("k")))
      .withColumn("nested", struct(map(lit("x"), col("k")).as("inner")))
    val small = Seq((1L, "x"), (2L, "y")).toDF("sk", "sv")
    val plain = mapped.join(small, col("k") === col("sk")).drop("attrs", "nested")
      .as[(Long, String, Long, String)].collect().toSet
    val salted = Skew.saltedJoin(mapped, small, "k", "sk", 4).drop("attrs", "nested")
      .as[(Long, String, Long, String)].collect().toSet
    assert(salted == plain)
    // pathological all-map big side: actionable error, not an analysis crash
    val allMaps = Seq(1L).toDF("k0").select(map(lit("a"), col("k0")).as("m"))
    val e = intercept[IllegalArgumentException](
      Skew.saltedJoin(allMaps, small, "m", "sk", 2))
    assert(e.getMessage.contains("MapType"), e.getMessage)
  }
}
