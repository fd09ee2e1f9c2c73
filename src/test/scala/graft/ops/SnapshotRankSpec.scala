package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SnapshotRankSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------- diffSnapshots

  test("diffSnapshots classifies added, removed, changed; omits unchanged") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "t")
    val neu = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("id", "t")
    val diff = Corpus
      .diffSnapshots(old, col("id"), col("t"), neu, col("id"), col("t"))
      .as[(Long, String)].collect().toMap
    assert(diff == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("diffSnapshots duplicate keys compare as a multiset") {
    val old = Seq((1L, "x"), (1L, "x")).toDF("id", "t")
    val sameBag = Seq((1L, "x"), (1L, "x")).toDF("id", "t")
    val fewer = Seq((1L, "x")).toDF("id", "t")
    assert(Corpus
      .diffSnapshots(old, col("id"), col("t"), sameBag, col("id"), col("t"))
      .count() == 0)
    val d = Corpus
      .diffSnapshots(old, col("id"), col("t"), fewer, col("id"), col("t"))
      .as[(Long, String)].collect().toSeq
    assert(d == Seq((1L, "changed")))
  }

  test("diffSnapshots value order within a key does not matter") {
    val old = Seq((1L, "p"), (1L, "q")).toDF("id", "t")
    val reordered = Seq((1L, "q"), (1L, "p")).toDF("id", "t")
    assert(Corpus
      .diffSnapshots(old, col("id"), col("t"), reordered, col("id"), col("t"))
      .count() == 0)
  }

  // --------------------------------------------------------- topFraction

  test("topFraction keeps exactly ceil(frac·n) best rows by (score DESC, id)") {
    val df = (1L to 100L).map(i => (i, (i % 10).toDouble)).toDF("id", "score")
    val out = Corpus.topFraction(df, col("score"), col("id"), 0.25)
    assert(out.count() == 25)
    // expected: global order by (score desc, id asc), first 25
    val expected = (1L to 100L).map(i => (i, (i % 10).toDouble))
      .sortBy { case (id, s) => (-s, id) }.take(25).map(_._1).toSet
    assert(out.select("id").as[Long].collect().toSet == expected)
  }

  test("topFraction tie band at the threshold cuts by id deterministically") {
    // all scores equal: the cut is purely by id
    val df = (1L to 10L).map(i => (i, 1.0)).toDF("id", "score")
    val out = Corpus.topFraction(df, col("score"), col("id"), 0.31)
    assert(out.select("id").as[Long].collect().toSet == (1L to 4L).toSet) // ceil(3.1) = 4
  }

  test("topFraction edge fractions: 0 keeps nothing, 1 keeps everything") {
    val df = (1L to 5L).map(i => (i, i.toDouble)).toDF("id", "score")
    assert(Corpus.topFraction(df, col("score"), col("id"), 0.0).count() == 0)
    assert(Corpus.topFraction(df, col("score"), col("id"), 1.0).count() == 5)
  }

  test("topFraction result is partition-count invariant") {
    val base = (1L to 97L).map(i => (i, ((i * 7) % 13).toDouble))
    val a = Corpus
      .topFraction(base.toDF("id", "score").repartition(2), col("score"), col("id"), 0.4)
      .select("id").as[Long].collect().toSet
    val b = Corpus
      .topFraction(base.toDF("id", "score").repartition(17), col("score"), col("id"), 0.4)
      .select("id").as[Long].collect().toSet
    assert(a == b)
    assert(a.size == math.ceil(0.4 * 97).toInt)
  }

  test("topFraction preserves all input columns") {
    val df = Seq((1L, 2.0, "m")).toDF("id", "score", "meta")
    assert(Corpus.topFraction(df, col("score"), col("id"), 1.0).columns.toSeq ==
      Seq("id", "score", "meta"))
  }
}
