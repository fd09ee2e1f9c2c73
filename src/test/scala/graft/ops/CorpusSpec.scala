package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit is deterministic, content-based, and leakage-proof for dups") {
    val df = Seq(
      (0L, "the quick brown fox"),
      (1L, "THE  quick   brown fox "), // format-noise dup of doc 0
      (2L, "a completely different document"),
      (3L, "yet another text")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), Corpus.hashSplit("text").as("split"))
      .as[(Long, String)].collect().toMap
    // format-noise duplicates share a fingerprint → same split (no leakage)
    assert(out(0L) == out(1L))
    assert(Set("train", "val", "test").contains(out(2L)))
    // stable across evaluations
    val again = df.select(col("doc_id"), Corpus.hashSplit("text").as("split"))
      .as[(Long, String)].collect().toMap
    assert(out == again)
  }

  test("leakageSafeSplit keeps near-dup clusters in one split; fractions hold") {
    val n = 3000
    val docs = (0 until n).map(i => (i.toLong, s"doc body $i")).toDF("doc_id", "text")
    // chain 0-1-2 is one cluster (transitively), 10-11 another
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("doc_a", "doc_b")
    val out = Corpus.leakageSafeSplit(docs, "doc_id", pairs)
      .as[(Long, String, String)].collect()
    val split = out.map(r => r._1 -> r._3).toMap
    // every corpus row present, original columns preserved
    assert(out.length == n && out.forall(r => r._2 == s"doc body ${r._1}"))
    // cluster members agree — including the transitive chain
    assert(split(0L) == split(1L) && split(1L) == split(2L))
    assert(split(10L) == split(11L))
    // singletons still spread across all three splits at ~shares
    val counts = out.groupBy(_._3).view.mapValues(_.length.toDouble).toMap
    assert(math.abs(counts("train") / n - 204.0 / 256) < 0.05)
    assert(counts.getOrElse("val", 0.0) > 0 && counts.getOrElse("test", 0.0) > 0)
    // deterministic
    val again = Corpus.leakageSafeSplit(docs, "doc_id", pairs)
      .as[(Long, String, String)].collect().map(r => r._1 -> r._3).toMap
    assert(split == again)
    intercept[IllegalArgumentException](
      Corpus.leakageSafeSplit(docs, "doc_id", pairs, trainBuckets = 300))
  }

  test("assembleSequences orders per key, caps hot keys pre-aggregation, one exchange") {
    val rows = Seq(
      (1L, 3L, "c"), (1L, 1L, "a"), (1L, 2L, "b"),
      (2L, 5L, "x"), (2L, 4L, "y")) ++
      (0 until 100).map(i => (3L, 100L + i, s"e$i")) // hot key
    val df = rows.toDF("k", "t", "v").repartition(5)
    val out = Corpus
      .assembleSequences(df, col("k"), Seq(col("t")), col("v"), maxLen = 10)
    val m = out.select("key", "seq", "n")
      .as[(Long, Seq[String], Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m(1L) == ((Seq("a", "b", "c"), 3)))
    assert(m(2L) == ((Seq("y", "x"), 2)))
    // hot key capped to the FIRST maxLen in order
    assert(m(3L) == (((0 until 10).map(i => s"e$i"), 10)))
    // window and groupBy share ONE hash exchange on the key (the second
    // exchange in the plan is this test's own repartition(5) scramble)
    val exchanges = out.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 2, s"expected scramble + one key exchange, got $exchanges")
    intercept[IllegalArgumentException](
      Corpus.assembleSequences(df, col("k"), Seq(col("t")), col("v"), 0))
    intercept[IllegalArgumentException](
      Corpus.assembleSequences(df, col("k"), Nil, col("v"), 5))
  }

  test("temperatureWeights: sqrt flattening, natural mix at alpha=1, bounds") {
    val df = (Seq.fill(900)("big") ++ Seq.fill(100)("small")).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val w5 = Corpus.temperatureWeights(df, col("s"), alpha = 0.5)
    assert(w5("big") == 30.0 && w5("small") == 10.0) // sqrt of exact counts
    // alpha 0.5 compresses the ratio: 9:1 natural → 3:1 weights
    assert(w5("big") / w5("small") == 3.0)
    val w1 = Corpus.temperatureWeights(df, col("s"), alpha = 1.0)
    assert(w1("big") / w1("small") == 9.0) // natural mix preserved
    intercept[IllegalArgumentException](
      Corpus.temperatureWeights(df, col("s"), alpha = 0.0))
    intercept[IllegalArgumentException](
      Corpus.temperatureWeights(df, col("s"), alpha = 1.5))
  }

  test("balancedShards: serpentine over global size rank equalizes shard bytes") {
    val rnd = new scala.util.Random(41)
    // lognormal-ish sizes: the skew that breaks hash/round-robin sharding
    val rows = (0 until 997).map(i =>
      (i.toLong, math.exp(rnd.nextGaussian() * 1.5 + 5).toLong max 1L))
    val df = rows.toDF("id", "sz").repartition(7)
    val shards = 6
    val assign = Corpus.balancedShards(df, col("id"), col("sz"), shards)
      .as[(Long, Int)].collect().toMap
    assert(assign.size == 997)
    assert(assign.values.forall(s => s >= 0 && s < shards))
    val size = rows.toMap
    val totals = assign.groupBy(_._2).view.mapValues(_.keys.map(size).sum).toMap
    val maxItem = size.values.max
    assert(totals.size == shards)
    // serpentine on the sorted stream: spread bounded by ~one max item
    assert(totals.values.max - totals.values.min <= maxItem,
      s"imbalance ${totals.values.max - totals.values.min} vs max item $maxItem")
    // per-shard counts differ by at most one full round
    val counts = assign.groupBy(_._2).view.mapValues(_.size).toMap
    assert(counts.values.max - counts.values.min <= 1)
    intercept[IllegalArgumentException](
      Corpus.balancedShards(df, col("id"), col("sz"), 0))
  }

  test("groupProfile: robust median/MAD per group, outliers flagged, stddev-proof") {
    // group a: tight around 100 with one wild outlier (MAD ignores it);
    // group b: clean spread, no outliers
    val rows = Seq.tabulate(21)(i => ("a", 90L + i)) ++ Seq(("a", 100000L)) ++
      Seq.tabulate(11)(i => ("b", 10L * i))
    val out = Corpus.groupProfile(rows.toDF("g", "v"), col("g"), col("v"), nMads = 3.0)
      .as[(String, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // a: 22 rows, median of 90..110 ∪ {100000} = 100.5, MAD = 5.5,
    // only the planted 100000 exceeds 3 MADs
    assert(out("a") == ((22L, 100.5, 5.5, 1L)))
    // b: 0,10,...,100 → median 50, MAD 30, max dev 50 < 90
    assert(out("b") == ((11L, 50.0, 30.0, 0L)))
    intercept[IllegalArgumentException](
      Corpus.groupProfile(rows.toDF("g", "v"), col("g"), col("v"), nMads = 0.0))
  }

  test("quantileBuckets equals window ntile on ties, skew, and n < k") {
    import org.apache.spark.sql.expressions.Window
    def check(df: org.apache.spark.sql.DataFrame, k: Int): Unit = {
      val got = Corpus.quantileBuckets(df, col("s"), col("id"), k)
        .select(col("id"), col("bucket")).as[(Long, Int)].collect().toMap
      val want = df.select(
        col("id"),
        ntile(k).over(Window.orderBy(col("s"), col("id"))).as("bucket"))
        .as[(Long, Int)].collect().toMap
      assert(got == want, s"k=$k mismatch")
    }
    val rnd = new scala.util.Random(3)
    // heavy ties (only 5 distinct scores) + scrambled partitioning
    val ties = (0 until 997).map(i => (i.toLong, (i % 5).toDouble))
      .toDF("id", "s").repartition(7)
    check(ties, 4)
    check(ties, 10)
    // skewed continuous scores
    val skew = (0 until 500).map(i => (i.toLong, math.pow(rnd.nextDouble(), 8)))
      .toDF("id", "s").repartition(5)
    check(skew, 3)
    // n < k: rows take buckets 1..n
    val tiny = Seq((7L, 1.0), (3L, 2.0), (9L, 0.5)).toDF("id", "s")
    check(tiny, 5)
    // k = 1 and empty input
    check(ties, 1)
    assert(Corpus.quantileBuckets(ties.limit(0), col("s"), col("id"), 4).count() == 0)
    intercept[IllegalArgumentException](
      Corpus.quantileBuckets(ties, col("s"), col("id"), 0))
  }

  test("mergeUpsert: updates win, tombstones delete, seq resolves multi-op keys") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v")
    // k=2 updated twice (seq 1 then 2), k=3 deleted, k=5 inserted
    val updates = Seq(
      (2L, "b1", 1L, false),
      (2L, "b2", 2L, false),
      (3L, "dead", 1L, true),
      (5L, "e", 1L, false)).toDF("k", "v", "seq", "del")
    val out = Corpus
      .mergeUpsert(base, updates, "k", seqCol = Some("seq"), tombstoneCol = Some("del"))
      .as[(Long, String)].collect().sorted.toSeq
    assert(out == Seq((1L, "a"), (2L, "b2"), (4L, "d"), (5L, "e")))
    // without seq/tombstone: plain upsert, unique keys
    val plain = Corpus
      .mergeUpsert(base, Seq((2L, "x")).toDF("k", "v"), "k")
      .as[(Long, String)].collect().sorted.toSeq
    assert(plain == Seq((1L, "a"), (2L, "x"), (3L, "c"), (4L, "d")))
    intercept[IllegalArgumentException](
      Corpus.mergeUpsert(base, Seq((1L, 2L)).toDF("k", "other"), "k"))
    intercept[IllegalArgumentException](
      Corpus.mergeUpsert(base, updates, "nope"))
  }

  test("hashSplit fractions approximate the bucket shares") {
    val docs = (0 until 2000).map(i => (i.toLong, s"document number $i with body"))
      .toDF("doc_id", "text")
    val counts = docs.select(Corpus.hashSplit("text").as("split"))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    val n = counts.values.sum.toDouble
    assert(math.abs(counts("train") / n - 204.0 / 256) < 0.05)
    assert(counts.getOrElse("val", 0L) > 0 && counts.getOrElse("test", 0L) > 0)
  }

  test("packByBudget chunks by cumulative tokens within shards") {
    // 6 docs of 3 tokens each, budget 7: exclusive prefix sums
    // 0,3,6,9,12,15 → packs 0,0,0,1,1,2
    val docs = (0 until 6).map(i => (i.toLong, "one two three")).toDF("doc_id", "text")
    val packs = Corpus
      .packByBudget(docs, "doc_id", TextAnalysis.tokenCount(col("text")).cast("bigint"),
        budget = 7L)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    assert(packs == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 2L))
    // shard isolation: ids in different shards never share a pack
    val sharded = (0 until 4).map(i => (i * 1000L, "one two")).toDF("doc_id", "text")
    val packIds = Corpus
      .packByBudget(sharded, "doc_id", TextAnalysis.tokenCount(col("text")).cast("bigint"),
        budget = 100L)
      .select("pack_id").as[Long].collect().toSet
    assert(packIds.size == 4)
  }

  test("tokenStats emits exact interpolated percentiles") {
    val docs = Seq((0L, "a"), (1L, "a b"), (2L, "a b c"), (3L, "a b c d e f g h i j"))
      .toDF("doc_id", "text")
    val row = Corpus.tokenStats(docs, "text", Seq(0.5, 0.9)).collect().head
    assert(row.getLong(0) == 4L)
    assert(row.getDouble(1) == 2.5) // linear interpolation between 2 and 3
  }

  test("stratifiedSample is deterministic, monotone in allowance, per-stratum") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = spark.range(0, 2000).toDF("id")
      .withColumn("lang", when(col("id") % 3 === 0, "en").otherwise("de"))
    def sample(en: Int, other: Int): Set[Long] = Corpus
      .stratifiedSample(docs, col("id"), col("lang"), Map("en" -> en), other)
      .select("id").as[Long].collect().toSet
    val s1 = sample(128, 192)
    assert(s1 == sample(128, 192)) // deterministic, not rand()
    // larger allowance strictly contains the smaller one (prefix property)
    assert(s1.subsetOf(sample(256, 256)))
    assert(sample(64, 192).subsetOf(s1))
    // rates land near buckets/256 per stratum
    val en = docs.where(col("lang") === "en").count().toDouble
    val de = docs.where(col("lang") === "de").count().toDouble
    val enKept = s1.count(_ % 3 == 0) / en
    val deKept = s1.count(_ % 3 != 0) / de
    assert(math.abs(enKept - 0.5) < 0.08, s"en rate $enKept")
    assert(math.abs(deKept - 0.75) < 0.08, s"de rate $deKept")
    // allowance 0 / 256 are exact
    assert(sample(0, 0).isEmpty)
    assert(sample(256, 256).size == 2000)
  }

  test("mixToWeights rebalances toward the target mixture, no upsampling") {
    // 1500 en / 300 de / 200 fr; target 1:1:1 — de (count/weight smallest
    // after fr?) fr is the binding stratum: T = 200/(1/3); keeps ~200 each
    val docs = spark.range(0, 2000).toDF("id")
      .withColumn("lang",
        when(col("id") < 1500, "en").when(col("id") < 1800, "de").otherwise("fr"))
    val w = Map("en" -> 1.0, "de" -> 1.0, "fr" -> 1.0)
    val kept = Corpus.mixToWeights(docs, col("id"), col("lang"), w)
      .select("id", "lang").as[(Long, String)].collect()
    val byLang = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // fr binds: its 200 rows cap each stratum near 200 (floor granularity
    // and md5-bucket noise allow slack)
    assert(byLang("fr") > 150 && byLang("fr") <= 200, s"fr=${byLang("fr")}")
    assert(byLang.values.forall(c => c > 120 && c < 260), s"mix $byLang")
    // deterministic
    val again = Corpus.mixToWeights(docs, col("id"), col("lang"), w)
      .select("id", "lang").as[(Long, String)].collect()
    assert(kept.toSet == again.toSet)
  }

  test("mixToWeights floors a >256x over-represented stratum at 1 bucket") {
    // 30000 en / 10 de, target 50/50: de binds (T = 20), en's raw allowance
    // floor(0.5 * 20 / 30000 * 256) = 0 — the floor keeps ~1/256 of en
    // instead of silently dropping the whole stratum
    val docs = spark.range(0, 30010).toDF("id")
      .withColumn("lang", when(col("id") < 30000, "en").otherwise("de"))
    val kept = Corpus
      .mixToWeights(docs, col("id"), col("lang"), Map("en" -> 0.5, "de" -> 0.5))
      .select("lang").as[String].collect()
    val en = kept.count(_ == "en")
    assert(en > 0, "positive-weight stratum was eliminated")
    assert(en < 1000, s"1-bucket floor should keep ~117 en rows, got $en")
    assert(kept.count(_ == "de") > 0)
  }

  test("stratifiedExactK draws exactly k per stratum, deterministic, under-k strata kept whole") {
    val docs = spark.range(0, 300).toDF("id")
      .withColumn("lang", when(col("id") % 3 === 0, "en")
        .when(col("id") % 3 === 1, "de").otherwise("fr"))
      .union(Seq((9000L, "xx")).toDF("id", "lang")) // 1-row stratum < k
    val kept = Corpus.stratifiedExactK(docs, col("id"), col("lang"), 5)
      .select("id", "lang").as[(Long, String)].collect()
    val byLang = kept.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byLang("en").size == 5 && byLang("de").size == 5 && byLang("fr").size == 5)
    assert(byLang("xx") == Set(9000L))
    // deterministic: same draw on a reshuffled input
    val again = Corpus
      .stratifiedExactK(docs.repartition(7, col("id")), col("id"), col("lang"), 5)
      .select("id", "lang").as[(Long, String)].collect()
    assert(again.toSet == kept.toSet)
    // content-addressed: the en draw is the 5 smallest (md5, id) keys
    val enExpected = (0L until 300L by 3)
      .sortBy(i => (java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, i))
      .take(5).toSet
    assert(byLang("en") == enExpected)
  }

  test("capGroupShare cuts only overweight groups, exactly to budget, deterministically") {
    // 400 rows: "big" holds 250 (62.5%), small0..small5 hold 25 each
    val docs = spark.range(0, 400).toDF("id")
      .withColumn("src", when(col("id") < 250, "big")
        .otherwise(concat(lit("small"), ((col("id") - 250) / 25).cast("int"))))
    // cap at 20% of 400 -> budget 80: big cut 250 -> 80, smalls untouched
    val kept = Corpus.capGroupShare(docs, col("id"), col("src"), 0.20)
      .select("id", "src").as[(Long, String)].collect()
    val bySrc = kept.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(bySrc("big").size == 80)
    (0 until 6).foreach(i => assert(bySrc(s"small$i").size == 25, s"small$i"))
    // the cut is the content-addressed (md5, id) prefix of the big group
    val bigExpected = (0L until 250L)
      .sortBy(i => (java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, i))
      .take(80).toSet
    assert(bySrc("big") == bigExpected)
    // deterministic under reshuffle
    val again = Corpus
      .capGroupShare(docs.repartition(7, col("id")), col("id"), col("src"), 0.20)
      .select("id", "src").as[(Long, String)].collect()
    assert(again.toSet == kept.toSet)
    // maxShare = 1.0 keeps everything; invalid shares refuse
    assert(Corpus.capGroupShare(docs, col("id"), col("src"), 1.0).count() == 400)
    intercept[IllegalArgumentException] {
      Corpus.capGroupShare(docs, col("id"), col("src"), 0.0)
    }
    intercept[IllegalArgumentException] {
      Corpus.capGroupShare(docs, col("id"), col("src"), 1.5)
    }
  }

  test("topKByGroup keeps the k best per group with deterministic tie-break") {
    val docs = Seq(
      (1L, "en", 50L), (2L, "en", 90L), (3L, "en", 90L), (4L, "en", 10L),
      (5L, "de", 7L), (6L, "de", 3L)).toDF("id", "lang", "score")
    val kept = Corpus
      .topKByGroup(docs, col("lang"), col("score"), col("id"), 2)
      .select("id").as[Long].collect().toSet
    // en: scores 90,90,50,10 -> ids 2,3 (tie at 90 keeps smaller ids first)
    assert(kept == Set(2L, 3L, 5L, 6L))
    val one = Corpus
      .topKByGroup(docs.repartition(5), col("lang"), col("score"), col("id"), 1)
      .select("id").as[Long].collect().toSet
    assert(one == Set(2L, 5L))
  }

  test("integrityReport counts orphans and duplicate keys exactly") {
    val left = Seq(1L, 2L, 3L, 3L, 4L).toDF("k")   // dup key 3, orphan 4
    val right = Seq(1L, 2L, 2L, 2L, 5L).toDF("k")  // dup key 2, orphan 5
    val r = Corpus.integrityReport(left, col("k"), right, col("k"))
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(r == ((5L, 5L, 2L, 1L, 1L, 1L)))
    // null keys are orphans on their own side, never joined
    val ln = Seq(Some(1L), None).toDF("k")
    val rn = Seq(Some(1L), None, None).toDF("k")
    val r2 = Corpus.integrityReport(ln, col("k"), rn, col("k"))
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(r2 == ((2L, 3L, 1L, 1L, 0L, 1L)))
  }

  test("epochsToWeights upsamples by repetition toward target weights") {
    // 300 en / 100 de, target 50/50 → T = 300/0.5 = 600; en r=1 (1 epoch),
    // de r=3 (3 epochs each)
    val docs = spark.range(0, 400).toDF("id")
      .withColumn("lang", when(col("id") < 300, "en").otherwise("de"))
    val out = Corpus
      .epochsToWeights(docs, col("id"), col("lang"),
        Map("en" -> 0.5, "de" -> 0.5))
      .select("id", "lang", "epoch")
      .as[(Long, String, Long)].collect()
    val byLang = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang == Map("en" -> 300, "de" -> 300))
    // every doc present, epochs dense from 0
    assert(out.filter(_._2 == "de").groupBy(_._1).forall {
      case (_, rows) => rows.map(_._3).sorted.toSeq == Seq(0L, 1L, 2L)
    })
    assert(out.filter(_._2 == "en").forall(_._3 == 0L))
    // fractional remainders draw deterministically: 250 en / 100 de at
    // 50/50 → de r=2.5 → 2 or 3 epochs per doc, ~250 total
    val frac = Corpus
      .epochsToWeights(
        spark.range(0, 350).toDF("id")
          .withColumn("lang", when(col("id") < 250, "en").otherwise("de")),
        col("id"), col("lang"), Map("en" -> 0.5, "de" -> 0.5))
      .where(col("lang") === "de").count()
    assert(frac > 220 && frac < 280, s"de epochs $frac not ~250")
    // unlisted strata drop; invalid weights fail fast
    val dropped = Corpus
      .epochsToWeights(docs, col("id"), col("lang"), Map("en" -> 1.0))
      .select("lang").distinct().as[String].collect().toSeq
    assert(dropped == Seq("en"))
    intercept[IllegalArgumentException](
      Corpus.epochsToWeights(docs, col("id"), col("lang"), Map.empty))
  }

  test("weightedSample keeps weight-1 rows, drops weight-0 rows, is deterministic") {
    val docs = spark.range(0, 600).toDF("id")
      .withColumn("w", when(col("id") < 200, 1.0)
        .when(col("id") < 400, 0.0).otherwise(0.5))
    val kept = Corpus.weightedSample(docs, col("id"), col("w"))
      .select("id").as[Long].collect().sorted.toSeq
    assert((0L until 200L).forall(kept.contains))       // w=1 always kept
    assert(!kept.exists(id => id >= 200 && id < 400))   // w=0 always dropped
    val mid = kept.count(id => id >= 400)
    assert(mid > 50 && mid < 150, s"w=0.5 kept $mid of 200") // ~half
    // deterministic under repartitioning; out-of-range weights clamp
    val again = Corpus
      .weightedSample(docs.repartition(7), col("id"), col("w"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == again)
    val clamped = Corpus
      .weightedSample(docs, col("id"), col("w") * 100 - lit(25.0))
      .count() // w*100-25: {75, -25, 25} → clamps to {1, 0, 1}
    assert(clamped == 400L)
  }

  test("globalShuffle: dense per-shard positions, partition-invariant, seeded") {
    val docs = spark.range(0, 500).toDF("id")
    val out = Corpus.globalShuffle(docs, col("id"), shards = 8, seed = "s1")
      .select("id", "shard", "pos")
      .as[(Long, Int, Long)].collect()
    assert(out.length == 500)
    // positions within each shard are exactly 1..n_shard
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length))
    }
    // every shard of 8 gets rows under a uniform hash at n=500
    assert(out.map(_._2).distinct.length == 8)
    // identical assignment under a different physical partitioning
    val again = Corpus
      .globalShuffle(docs.repartition(13), col("id"), shards = 8, seed = "s1")
      .select("id", "shard", "pos")
      .as[(Long, Int, Long)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // a different seed yields a different permutation
    val other = Corpus.globalShuffle(docs, col("id"), shards = 8, seed = "s2")
      .select("id", "shard", "pos")
      .as[(Long, Int, Long)].collect()
    assert(out.sortBy(_._1).toSeq != other.sortBy(_._1).toSeq)
    intercept[IllegalArgumentException](
      Corpus.globalShuffle(docs, col("id"), shards = 0))
    // output-name collisions fail fast instead of silently overwriting
    intercept[IllegalArgumentException](
      Corpus.globalShuffle(docs.withColumn("pos", lit(1)), col("id"), 2))
    intercept[IllegalArgumentException](
      Corpus.epochsToWeights(
        docs.withColumn("epoch", lit(1)).withColumn("lang", lit("en")),
        col("id"), col("lang"), Map("en" -> 1.0)))
  }

  test("mixToWeights drops unlisted strata and validates weights") {
    val docs = spark.range(0, 300).toDF("id")
      .withColumn("lang", when(col("id") % 3 === 0, "en")
        .when(col("id") % 3 === 1, "de").otherwise("xx"))
    val kept = Corpus
      .mixToWeights(docs, col("id"), col("lang"), Map("en" -> 0.5, "de" -> 0.5))
      .select("lang").as[String].collect()
    assert(!kept.contains("xx"))
    // balanced targets on balanced strata keep everything (allowance 256)
    assert(kept.length == 200)
    intercept[IllegalArgumentException] {
      Corpus.mixToWeights(docs, col("id"), col("lang"), Map.empty)
    }
    intercept[IllegalArgumentException] {
      Corpus.mixToWeights(docs, col("id"), col("lang"), Map("en" -> 0.0))
    }
  }

  // --- r11 review regressions ---

  test("capGroupShare caps a null group like any other") {
    // null group holds 80% of rows; cap at 25% -> must be cut to 25
    val docs = spark.range(0, 100).toDF("id")
      .withColumn("src", when(col("id") < 80, lit(null).cast("string"))
        .otherwise(lit("ok")))
    val kept = Corpus.capGroupShare(docs, col("id"), col("src"), 0.25)
      .select("id", "src").collect()
    val nullRows = kept.count(_.isNullAt(1))
    assert(nullRows == 25, s"null group kept $nullRows rows, budget is 25")
    assert(kept.count(!_.isNullAt(1)) == 20) // under-cap group untouched
  }

  test("mergeUpsert equal-seq ties resolve deterministically, delete wins") {
    val base = Seq((1L, "a")).toDF("k", "v")
    // same key, same seq: an upsert and a tombstone — delete must win on
    // every run and partitioning
    val updates = Seq(
      (1L, "a2", 5L, false),
      (1L, "gone", 5L, true)).toDF("k", "v", "seq", "del")
    (1 to 3).foreach { p =>
      val out = Corpus
        .mergeUpsert(base, updates.repartition(p), "k",
          seqCol = Some("seq"), tombstoneCol = Some("del"))
        .as[(Long, String)].collect()
      assert(out.isEmpty, s"partitions=$p: tombstone must win the tie")
    }
    // equal-seq ties without a tombstone pick one content-hash winner,
    // stable across partitionings
    val up2 = Seq((1L, "x", 5L, false), (1L, "y", 5L, false))
      .toDF("k", "v", "seq", "del")
    val winners = (1 to 3).map { p =>
      Corpus.mergeUpsert(base, up2.repartition(p), "k",
        seqCol = Some("seq"), tombstoneCol = Some("del"))
        .as[(Long, String)].collect().toSeq
    }
    assert(winners.distinct.size == 1, s"tie winner varied: $winners")
  }

  test("exact-rank machinery fails loudly on null scores and ids") {
    val withNullScore = spark.range(0, 10).toDF("id")
      .withColumn("score", when(col("id") === 3, lit(null).cast("double"))
        .otherwise(col("id").cast("double")))
    val eScore = intercept[Exception](
      Corpus.topFraction(withNullScore, col("score"), col("id"), 0.5).count())
    assert(eScore.getMessage.contains("must be non-null"), eScore.getMessage)
    val eBucket = intercept[Exception](
      Corpus.quantileBuckets(withNullScore, col("score"), col("id"), 4).count())
    assert(eBucket.getMessage.contains("must be non-null"), eBucket.getMessage)
    // a null id raises instead of ranking (a malformed STRING id already
    // fails loudly via the ANSI cast itself)
    val badId = spark.range(0, 5).toDF("n")
      .withColumn("uid", when(col("n") === 2, lit(null).cast("long"))
        .otherwise(col("n")))
    val eId = intercept[Exception](
      Corpus.balancedShards(badId, col("uid"), col("n"), 2).count())
    assert(eId.getMessage.contains("must be non-null"), eId.getMessage)
  }

  test("leakageSafeSplit handles string ids; long-id buckets unchanged") {
    val emptyPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    // UUID-style ids: every singleton used to md5(null) -> all "test"
    val docs = spark.range(0, 600).toDF("n")
      .withColumn("uid", concat(lit("doc-"), col("n")))
    val splits = Corpus.leakageSafeSplit(docs, "uid", emptyPairs)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(splits.getOrElse("train", 0L) > 300L,
      s"string-id singletons must mostly land in train, got $splits")
    // numeric ids render identically as strings, so the historical
    // bucketing is preserved: "123" hashes the same through either path
    val longDocs = spark.range(0, 100).toDF("id")
    val a = Corpus.leakageSafeSplit(longDocs, "id", emptyPairs)
      .select("id", "split").as[(Long, String)].collect().toMap
    longDocs.select(col("id"),
      Corpus.hashBucket(col("id")).as("b")).as[(Long, Int)].collect()
      .foreach { case (id, b) =>
        val want = if (b < 204) "train" else if (b < 230) "val" else "test"
        assert(a(id) == want, s"id=$id bucket=$b")
      }
  }

  test("packByBudget refuses cap overflow instead of colliding pack ids") {
    intercept[IllegalArgumentException](
      Corpus.packByBudget(
        spark.range(0, 5).toDF("id"), "id", lit(1L), 10L, packsPerShardCap = 0L))
    // 3 docs x 100 tokens in one shard with budget 10 -> needs 30 packs > cap 2
    val docs = spark.range(0, 3).toDF("id")
    val e = intercept[Exception](
      Corpus.packByBudget(docs, "id", lit(100L), 10L,
        shardSize = 1000L, packsPerShardCap = 2L).select("pack_id").collect())
    assert(e.getMessage.contains("packsPerShardCap"), e.getMessage)
  }

  test("tokenStats labels round and refuse collisions") {
    val docs = Seq("a b c", "a b", "a").toDF("text")
    val cols = Corpus.tokenStats(docs, "text", Seq(0.29, 0.5)).columns.toSeq
    assert(cols == Seq("n_docs", "p29", "p50"), cols.toString)
    intercept[IllegalArgumentException](
      Corpus.tokenStats(docs, "text", Seq(0.99, 0.991)))
  }

  test("dsirScores: closed-form log-likelihood-ratio weights; blank docs drop") {
    // independent md5-prefix hash (java MessageDigest, not Spark's md5) so
    // the expected weights share no code with the op
    def bucket(g: String, b: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8"))
      val hex = md.take(4).map(x => f"${x & 0xFF}%02x").mkString
      java.lang.Long.parseLong(hex, 16) % b
    }
    val B = 101
    val grams = Seq("a", "b", "c", "d", "a a", "a b", "c c", "c d")
    assert(grams.map(bucket(_, B)).distinct.size == grams.size,
      s"fixture grams collide at B=$B — pick another B")
    // raw: doc1 "a a b" -> a,a,b,"a a","a b" (5); doc2 "c c d" -> c,c,d,
    // "c c","c d" (5 — SAME gram count as doc1, so the selection claim is
    // not confounded by DSIR's length drift); R=10. target: "a b"; T=3
    val raw = Seq((1L, "a a b"), (2L, "c c d"), (3L, "   ")).toDF("doc_id", "text")
    val target = Seq((9L, "a b")).toDF("doc_id", "text")
    val rc = Map("a" -> 2L, "b" -> 1L, "c" -> 2L, "d" -> 1L,
      "a a" -> 1L, "a b" -> 1L, "c c" -> 1L, "c d" -> 1L)
    val tc = Map("a" -> 1L, "b" -> 1L, "a b" -> 1L).withDefaultValue(0L)
    def w(g: String): Double =
      math.log((tc(g) + 1).toDouble / (3 + B)) -
        math.log((rc(g) + 1).toDouble / (10 + B))
    val got = Corpus.dsirScores(raw, target, "doc_id", "text", buckets = B)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got.keySet == Set(1L, 2L), "blank doc must drop")
    val exp1 = 2 * w("a") + w("b") + w("a a") + w("a b")
    assert(math.abs(got(1L)._1 - exp1) < 1e-12, s"${got(1L)._1} vs $exp1")
    assert(got(1L)._2 == 5L)
    val exp2 = 2 * w("c") + w("d") + w("c c") + w("c d")
    assert(math.abs(got(2L)._1 - exp2) < 1e-12)
    assert(got(2L)._2 == 5L)
    // selection keeps the target-looking doc: doc1 shares grams with the
    // target, doc2 is raw-only vocabulary at the same gram count
    assert(exp1 > exp2)
    val sel = Corpus.dsirSelect(raw, target, "doc_id", "text", frac = 0.5, buckets = B)
      .select("doc_id").as[Long].collect().toSeq
    assert(sel == Seq(1L))
    // an EMPTY target must not null the weights (T=0 is well-defined under
    // add-one smoothing: every bucket weight = ln(1/B) - ln((rc+1)/(R+B)))
    val emptyTarget = target.where(lit(false))
    val gotE = Corpus.dsirScores(raw, emptyTarget, "doc_id", "text", buckets = B)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def wE(g: String): Double =
      math.log(1.0 / B) - math.log((rc(g) + 1).toDouble / (10 + B))
    val expE = 2 * wE("a") + wE("b") + wE("a a") + wE("a b")
    assert(math.abs(gotE(1L) - expE) < 1e-12, s"${gotE(1L)} vs $expE")
  }
}
