package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property coverage for the round-9 sharding/chunking operators: random
  * corpora generated with seeded scalacheck, invariants checked
  * driver-side after ONE Spark pass per case (per-example Spark jobs
  * would be minutes; the invariants are per-row so batching loses
  * nothing).
  */
class PipelinePropertySpec extends SparkSpec {
  import spark.implicits._

  private def seeded[T](g: Gen[T], i: Int): T =
    g.pureApply(Gen.Parameters.default.withSize(40), Seed(11L + i))

  private val docGen: Gen[String] = for {
    n <- Gen.choose(0, 60)
    toks <- Gen.listOfN(n, Gen.choose(0, 30).map(i => s"t$i"))
  } yield toks.mkString(" ")

  test("chunkByTokens invariants on random corpora") {
    val docs = (0 until 150).map(i => (i.toLong, seeded(docGen, i)))
    val df = docs.toDF("id", "text")
    for ((maxT, over) <- Seq((7, 0), (7, 3), (12, 11), (1, 0))) {
      val stride = maxT - over
      val out = TextAnalysis.chunkByTokens(df, "id", "text", maxT, over)
        .as[(Long, Int, String, Int)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      docs.foreach { case (id, text) =>
        val toks = text.trim.split("\\s+").toSeq // "" → Seq("") like Spark
        val n = if (text.trim.isEmpty) 1 else toks.length
        val chunks = out.getOrElse(id, Array.empty).toSeq
        // chunk i starts at i·stride; text is the exact token slice
        chunks.foreach { case (_, idx, ctext, ctoks) =>
          val start = idx * stride
          val want = toks.slice(start, start + maxT)
          assert(ctext == want.mkString(" "),
            s"id=$id maxT=$maxT over=$over idx=$idx")
          assert(ctoks == (if (ctext.isEmpty) 1 else want.length))
        }
        // indexes dense from 0; every token covered; last chunk starts
        // new content (not contained in the previous window)
        assert(chunks.map(_._2) == chunks.indices.map(identity))
        assert(chunks.nonEmpty == (n > 0))
        val lastStart = (chunks.length - 1) * stride
        if (chunks.length > 1) assert(lastStart + over < n)
        val covered = chunks.map(c => math.min(c._2 * stride + maxT, n)).max
        assert(covered >= n, s"id=$id uncovered tail")
        // overlap=0 ⇒ chunks partition the doc exactly
        if (over == 0)
          assert(chunks.map(_._3).mkString(" ") == toks.mkString(" "))
      }
    }
  }

  test("globalShuffle is a bijection onto dense per-shard positions") {
    val gen = Gen.choose(1, 9)
    for (i <- 0 until 3) {
      val shards = seeded(gen, i)
      val n = 200 + 37 * i
      val out = Corpus
        .globalShuffle(spark.range(0, n).toDF("id"), col("id"), shards, s"s$i")
        .select("id", "shard", "pos").as[(Long, Int, Long)].collect()
      assert(out.length == n)
      assert(out.map(_._1).distinct.length == n)
      out.groupBy(_._2).foreach { case (s, rows) =>
        assert(s >= 0 && s < shards)
        assert(rows.map(_._3).sorted.toSeq == (1L to rows.length))
      }
    }
  }

  test("quantileBuckets is an order-respecting equal-count partition on random data") {
    val scoreGen = Gen.oneOf(
      Gen.choose(0.0, 1.0),                    // continuous
      Gen.choose(0, 4).map(_.toDouble),        // heavy ties
      Gen.choose(0.0, 1.0).map(x => x * x * x)) // skew
    for (i <- 0 until 3) {
      val n = 150 + 101 * i
      val k = 3 + i * 2
      val rows = (0 until n).map(j => (j.toLong, seeded(scoreGen, i * 10000 + j)))
      val out = Corpus
        .quantileBuckets(rows.toDF("id", "s").repartition(5), col("s"), col("id"), k)
        .select("id", "s", "bucket").as[(Long, Double, Int)].collect()
      assert(out.length == n)
      val sizes = out.groupBy(_._3).view.mapValues(_.length).toMap
      // ntile contract: sizes differ by at most 1, buckets 1..k used
      assert(sizes.keySet == (1 to k).toSet)
      assert(sizes.values.max - sizes.values.min <= 1)
      // order-respecting: every row in bucket b sorts <= every row in b+1
      // under the (score, id) total order
      val byBucket = out.groupBy(_._3).view
        .mapValues(_.map(r => (r._2, r._1)).sorted).toMap
      (1 until k).foreach { b =>
        assert(Ordering[(Double, Long)].lteq(byBucket(b).last, byBucket(b + 1).head),
          s"bucket $b overlaps bucket ${b + 1}")
      }
    }
  }

  test("sharded bloom never false-negatives on random corpora") {
    val textGen = Gen.listOfN(6, Gen.alphaNumChar).map(_.mkString)
    for (i <- 0 until 3) {
      val keys = (0 until 300).map(j => seeded(textGen, i * 1000 + j)).distinct
      val df = keys.zipWithIndex.map { case (t, j) => (j.toLong, t) }.toDF("id", "text")
      val blooms = Dedup.shardedBloom(
        df, col("text"), expectedItems = 256L, fpp = 0.03, shards = 1 + i * 3)
      assert(df.where(!Dedup.mightContain(blooms, col("text"))).count() == 0L)
    }
  }
}
