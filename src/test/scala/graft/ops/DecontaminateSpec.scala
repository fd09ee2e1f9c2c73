package graft.ops

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("ngrams builds overlapping word n-grams, empty below n tokens") {
    val df = Seq("a b c d", "a", "").toDF("text")
      .select(Decontaminate.ngrams(col("text"), 2).as("g"))
      .as[Seq[String]].collect()
    assert(df(0) == Seq("a b", "b c", "c d"))
    assert(df(1).isEmpty)
    assert(df(2).isEmpty)
  }

  test("ngrams keeps duplicate grams (multiplicity), unlike word_shingles") {
    val Array(grams, shingles) = Seq("a b a b a")
      .toDF("text")
      .select(
        Decontaminate.ngrams(col("text"), 2).as("g"),
        graft.functions.word_shingles(col("text"), 2).as("s"))
      .as[(Seq[String], Seq[String])].collect()
      .flatMap(t => Array(t._1, t._2))
    assert(grams == Seq("a b", "b a", "a b", "b a"))
    assert(shingles.toSet == Set("a b", "b a") && shingles.length == 2)
  }

  test("contaminatedIds flags n-gram overlap; hashed and raw paths agree") {
    val docs = Seq(
      (1L, "the quick brown fox jumps high"),
      (2L, "totally different words here now"),
      (3L, "see the quick brown fox run")).toDF("doc_id", "text")
    val eval = Seq((100L, "a lazy dog met the quick brown fox")).toDF("doc_id", "text")
    def ids(hashed: Boolean): Set[Long] = Decontaminate
      .contaminatedIds(docs, eval, "doc_id", "text", n = 3, hashGrams = hashed)
      .as[Long].collect().toSet
    // docs 1 and 3 share "the quick brown" / "quick brown fox" with eval
    assert(ids(hashed = false) == Set(1L, 3L))
    assert(ids(hashed = true) == Set(1L, 3L))
    val clean = Decontaminate
      .decontaminate(docs, eval, "doc_id", "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(2L))
  }

  test("overlapStats counts distinct-gram overlap; short docs have no row") {
    val docs = Seq(
      (1L, "the quick brown fox jumps high"), // grams: 4 distinct, 2 shared
      (2L, "totally different words here now"), // 3 distinct, 0 shared
      (3L, "tiny")).toDF("doc_id", "text") // < n words: no grams
    val eval = Seq((100L, "a lazy dog met the quick brown fox")).toDF("doc_id", "text")
    def stats(hashed: Boolean): Map[Long, (Long, Long, Double)] = Decontaminate
      .overlapStats(docs, eval, "doc_id", "text", n = 3, hashGrams = hashed)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val raw = stats(hashed = false)
    assert(raw == Map(
      1L -> ((2L, 4L, 0.5)),
      2L -> ((0L, 3L, 0.0))))
    assert(stats(hashed = true) == raw)
  }

  test("decontaminateByOverlap thresholds; 0.0 matches the any-gram rule") {
    val docs = Seq(
      (1L, "the quick brown fox jumps high"), // frac 0.5
      (2L, "totally different words here now"), // frac 0
      (3L, "tiny")).toDF("doc_id", "text") // gram-less: always kept
    val eval = Seq((100L, "a lazy dog met the quick brown fox")).toDF("doc_id", "text")
    def kept(maxFrac: Double): Set[Long] = Decontaminate
      .decontaminateByOverlap(docs, eval, "doc_id", "text", maxFrac, n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept(0.6) == Set(1L, 2L, 3L))
    assert(kept(0.4) == Set(2L, 3L))
    val anyGram = Decontaminate.decontaminate(docs, eval, "doc_id", "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept(0.0) == anyGram)
    intercept[IllegalArgumentException] {
      Decontaminate.decontaminateByOverlap(docs, eval, "doc_id", "text", 1.0)
    }
  }

  // --- r11 review regressions ---

  test("gram size n must be >= 1; semanticDecontaminate round-trips the anti-join") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Decontaminate.contaminatedIds(docs, docs, "doc_id", "text", n = 0))
    intercept[IllegalArgumentException](
      Decontaminate.decontaminate(docs, docs, "doc_id", "text", n = -1))
    // semantic: doc 1 is near the eval vector, doc 2 is orthogonal
    val train = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(0.9f, 0.1f))).toDF("doc_id", "vec")
      .select(col("doc_id"), col("vec").cast("array<float>").as("vec"))
    val ev = Seq(Tuple1(Seq(1.0f, 0.0f))).toDF("vec")
      .select(col("vec").cast("array<float>").as("vec"))
    val flagged = Decontaminate
      .semanticContaminatedIds(train, ev, "doc_id", "vec", 0.9)
      .as[Long].collect().toSet
    assert(flagged == Set(1L, 3L))
    val kept = Decontaminate
      .semanticDecontaminate(train, ev, "doc_id", "vec", 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L))
    intercept[IllegalArgumentException](
      Decontaminate.semanticDecontaminate(train, ev, "doc_id", "vec", 1.5))
  }
}
