package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token and subword counts") {
    val df = Seq((1L, "Hello, world! It's 42 degrees.")).toDF("id", "text")
    val r = df.select(
      TextAnalysis.tokenCount(col("text")).as("t"),
      TextAnalysis.subwordCount(col("text")).as("s"))
      .as[(Int, Int)].head()
    assert(r._1 == 5) // whitespace tokens
    // subwords: Hello , world ! It ' s 42 degrees . = 10
    assert(r._2 == 10)
  }

  test("top_ngram_ratio measures word/bigram repetition (codegen + SQL)") {
    val df = Seq(
      (1L, "a a a b"), // top word 'a': 3/4
      (2L, "a b a b a"), // bigrams: a b, b a, a b, b a -> top 2/4
      (3L, "x")) // fewer than 2 tokens: bigram ratio 0.0
      .toDF("id", "text")
    val r = df.select(
      col("id"),
      graft.functions.top_ngram_ratio(col("text"), 1).as("w"),
      graft.functions.top_ngram_ratio(col("text"), 2).as("b"))
      .as[(Long, Double, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(r(1L)._1 == 0.75)
    assert(r(2L)._2 == 0.5)
    assert(r(3L) == ((1.0, 0.0)))
    // registered SQL function agrees
    df.createOrReplaceTempView("tnr_docs")
    val viaSql = spark.sql(
      "SELECT id, top_ngram_ratio(text, 1) FROM tnr_docs ORDER BY id")
      .as[(Long, Double)].collect().toMap
    assert(viaSql(1L) == 0.75)
  }

  test("qualityKeep applies token window, diversity floor, repetition cap") {
    val words = (1 to 50).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, words), // 50 distinct tokens: keep
      (2L, "too short"), // below minTokens
      (3L, (1 to 50).map(_ => "spam").mkString(" ")), // zero diversity
      (4L, (1 to 25).map(_ => "ab ba").mkString(" ")) // top bigram dominates
    ).toDF("id", "text")
    val kept = df.where(TextAnalysis.qualityKeep(col("text")))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("fingerprint normalizes case and whitespace") {
    val df = Seq(
      (1L, "Hello   World"),
      (2L, "hello world"),
      (3L, "hello worlds")).toDF("id", "text")
    val fps = df.select(col("id"), TextAnalysis.fingerprint(col("text")))
      .as[(Long, String)].collect().toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("langId picks the language with most marker hits, alphabetical ties") {
    val df = Seq(
      (1L, "the cat is on the mat and it is not here"), // en
      (2L, "der hund ist nicht da und die katze"), // de
      (3L, "el perro y los gatos no es aqui"), // es
      (4L, "xyzzy plugh")) // no markers anywhere -> first lang (de)
      .toDF("id", "text")
    val preds = df.select(col("id"), TextAnalysis.langId(col("text")))
      .as[(Long, String)].collect().toMap
    assert(preds(1L) == "en")
    assert(preds(2L) == "de")
    assert(preds(3L) == "es")
    assert(preds(4L) == "de")
  }

  test("quality features computes consistent counts") {
    val df = Seq((1L, "the the quick fox!")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityFeatures(df, "doc_id", "text").head()
    assert(r.getAs[Int]("n_tokens") == 4)
    assert(r.getAs[Int]("n_distinct_tokens") == 3)
    assert(r.getAs[Int]("n_stopwords") == 2)
    assert(r.getAs[Int]("n_punct") == 1)
  }

  test("normalizeText: NFC composition, accent strip, ROOT lowercase on Unicode fixtures") {
    // "Café" with a precomposed é vs e + COMBINING ACUTE — NFC unifies them
    val composed = "Café"
    val decomposed = "Cafe\u0301" // e + COMBINING ACUTE ACCENT
    val df = Seq(
      (1L, composed),
      (2L, decomposed),
      (3L, "STRASSE ß"), // ROOT lower keeps ß (no locale expansion)
      (4L, "naïve ÉCOLE")).toDF("id", "text")
    val norm = df.select(col("id"),
      TextAnalysis.normalizeText(col("text")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(norm(1L) == norm(2L), "NFC must unify composition forms")
    assert(norm(1L) == "café")
    assert(norm(3L) == "strasse ß")
    val stripped = df.select(col("id"),
      TextAnalysis.normalizeText(col("text"), stripAccents = true).as("n"))
      .as[(Long, String)].collect().toMap
    assert(stripped(1L) == "cafe" && stripped(2L) == "cafe")
    assert(stripped(4L) == "naive ecole")
    // case-preserving variant
    val kept = df.select(
      TextAnalysis.normalizeText(col("text"), lower = false).as("n"))
      .as[String].collect()
    assert(kept.contains(composed))
    // registered SQL form agrees (defaults and explicit literals)
    graft.functions.registerAll(spark)
    df.createOrReplaceTempView("norm_docs")
    val viaSql = spark.sql(
      "SELECT id, normalize_text(text), normalize_text(text, true, true) " +
        "FROM norm_docs ORDER BY id")
      .as[(Long, String, String)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(viaSql(1L) == (("café", "cafe")))
  }

  test("linearScore matches an independent SQL md5-bucket derivation; keep rule is the logit sign") {
    val weights = Array.tabulate(64)(i => (((i * 2654435761L) % 1003L) - 501L) * 100L)
    val bias = 700L
    val df = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "a b a b a b"),
      (3L, "  padded   whitespace text  "),
      (4L, "solo")).toDF("id", "text")
    // independent derivation of the same bucket rule through Spark SQL's
    // md5/conv built-ins (the oracle's formula), summed per doc
    val viaSql = df
      .select(col("id"), explode(split(trim(col("text")), "\\s+")).as("t"))
      .withColumn("b", (conv(substring(md5(col("t")), 1, 8), 16, 10)
        .cast("long") % weights.length).cast("int"))
      .withColumn("w", element_at(
        array(weights.map(lit): _*), col("b") + 1))
      .groupBy("id").agg(sum("w").as("s"))
      .as[(Long, Long)].collect().toMap
    val native = df.select(col("id"),
      TextAnalysis.linearScore(col("text"), weights).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(native == viaSql, s"native $native != sql $viaSql")
    val logit = df.select(col("id"),
      TextAnalysis.linearLogitFp(col("text"), weights, bias).as("l"),
      TextAnalysis.linearKeep(col("text"), weights, bias).as("k"))
      .as[(Long, Long, Boolean)].collect()
    logit.foreach { case (_, l, k) => assert(k == (l >= 0)) }
    // deterministic across invocations
    val again = df.select(col("id"),
      TextAnalysis.linearScore(col("text"), weights).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(again == native)
  }

  test("bigramNovelty counts rare-bigram positions with multiplicity") {
    val docs = Seq(
      (1L, "a b a b"),       // bigrams: "a b", "b a", "a b" — "a b" ×2
      (2L, "a b c"),         // "a b", "b c"
      (3L, "x y x y x y"),   // "x y" ×3, "y x" ×2
      (4L, "solo"),          // single token — 0 bigrams
      (5L, "a b q r"))       // "a b", "b q", "q r"
      .toDF("id", "text")
    // corpus counts: "a b"=4, "b a"=1, "b c"=1, "x y"=3, "y x"=2,
    //                "b q"=1, "q r"=1
    val out = TextAnalysis.bigramNovelty(docs, "id", "text", minCount = 2L)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == ((3L, 1L)))  // "b a" rare
    assert(out(2L) == ((2L, 1L)))  // "b c" rare
    assert(out(3L) == ((5L, 0L)))  // both bigrams frequent
    assert(out(4L) == ((0L, 0L)))  // no bigrams at all
    assert(out(5L) == ((3L, 2L)))  // "b q", "q r" rare
    intercept[IllegalArgumentException](
      TextAnalysis.bigramNovelty(docs, "id", "text", minCount = 0L))
  }

  test("chunkByTokens: boundaries, overlap, tail handling, degenerate sizes") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // 10 tokens
      (2L, "a b c"),                           // fits one chunk
      (3L, "x"))                               // single token
      .toDF("id", "text")
    // maxTokens=4, overlap=2 → stride 2; doc 1 starts: 0,2,4,6 (8 dropped:
    // 8+2 >= 10 — chunk [t9..t10] is fully inside [t7..t10])
    val out = TextAnalysis.chunkByTokens(docs, "id", "text", 4, 2)
      .orderBy(col("id"), col("chunk_idx"))
      .as[(Long, Int, String, Int)].collect().toSeq
    val doc1 = out.filter(_._1 == 1L)
    assert(doc1.map(_._3) == Seq(
      "t1 t2 t3 t4", "t3 t4 t5 t6", "t5 t6 t7 t8", "t7 t8 t9 t10"))
    assert(doc1.map(_._2) == Seq(0, 1, 2, 3))
    assert(doc1.forall(_._4 == 4))
    assert(out.filter(_._1 == 2L).map(_._3) == Seq("a b c"))
    assert(out.filter(_._1 == 3L).map(_._3) == Seq("x"))
    // every token of doc 1 is covered by at least one chunk
    val covered = doc1.flatMap(_._3.split(" ")).toSet
    assert(covered == (1 to 10).map(i => s"t$i").toSet)
    // no-overlap chunking partitions exactly
    val flat = TextAnalysis.chunkByTokens(docs, "id", "text", 4, 0)
      .where(col("id") === 1L).orderBy(col("chunk_idx"))
      .as[(Long, Int, String, Int)].collect().toSeq
    assert(flat.map(_._3) == Seq("t1 t2 t3 t4", "t5 t6 t7 t8", "t9 t10"))
    assert(flat.last._4 == 2)
    intercept[IllegalArgumentException](
      TextAnalysis.chunkByTokens(docs, "id", "text", 0))
    intercept[IllegalArgumentException](
      TextAnalysis.chunkByTokens(docs, "id", "text", 4, 4))
  }

  test("piiScrub redacts emails, SSNs, phones, IPs and leaves clean text") {
    val cases = Seq(
      "mail a.b+c_1%d@sub.example.org now" -> "mail <EMAIL> now",
      "ssn 123-45-6789 ok" -> "ssn <SSN> ok",
      "call 415-555-0123 or 415.555.0123" -> "call <PHONE> or <PHONE>",
      "host 192.168.0.1 up" -> "host <IP> up",
      "all: x@y.io 987-65-4321 212 555 9876 10.0.0.255" ->
        "all: <EMAIL> <SSN> <PHONE> <IP>",
      // non-PII lookalikes survive: version strings (2 dots), short codes
      "v1.2.3 and 12-34 stay" -> "v1.2.3 and 12-34 stay")
    val out = cases.map(_._1).toDF("text")
      .select(TextAnalysis.piiScrub(col("text")))
      .as[String].collect()
    cases.map(_._2).zip(out).foreach { case (want, got) => assert(got == want) }
  }

  test("winnowing: window coverage, shared-run guarantee, short-doc edge cases") {
    val rnd = new scala.util.Random(13)
    def words(n: Int) = Seq.fill(n)(s"w${rnd.nextInt(100000)}").mkString(" ")
    val shared = "alpha beta gamma delta epsilon zeta eta" // 7 >= w+k-1 = 6 tokens
    val df = Seq(
      (1L, words(30) + " " + shared + " " + words(30)),
      (2L, words(25) + " " + shared + " " + words(25)),
      (3L, words(40)),         // unrelated
      (4L, "only two"),        // < k tokens → no grams → no fingerprints
      (5L, "just three words") // exactly k → 1 gram, n < w → one window
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowingFingerprints(df, "doc_id", "text", k = 3, w = 4)
      .as[(Long, Int, Long)].collect()
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3))).toMap
    // the winnowing guarantee: a shared token run of >= w+k-1 shares a fp
    val f1 = byDoc(1L).map(_._2).toSet
    val f2 = byDoc(2L).map(_._2).toSet
    assert((f1 intersect f2).nonEmpty, "shared 7-token run must share a fingerprint")
    assert((byDoc(3L).map(_._2).toSet intersect f1).isEmpty)
    // every window of doc 1 is covered by some selected position
    val positions = byDoc(1L).map(_._1).toSet
    val nGrams = df.where(col("doc_id") === 1)
      .select(size(graft.functions.word_ngrams(col("text"), 3))).as[Int].head()
    (1 to (nGrams - 4 + 1)).foreach { i =>
      assert(positions.exists(p => p >= i && p < i + 4), s"window $i uncovered")
    }
    // doc 4 emits nothing; doc 5's single gram is its own fingerprint at pos 1
    assert(!byDoc.contains(4L))
    assert(byDoc(5L).map(_._1).toSeq == Seq(1))
    intercept[IllegalArgumentException](
      TextAnalysis.winnowingFingerprints(df, "doc_id", "text", k = 0))
    intercept[IllegalArgumentException](
      TextAnalysis.winnowingFingerprints(df, "doc_id", "text", w = 0))
  }

  test("winnowingOverlapPairs detects shared runs; the hot-fp cap drops boilerplate") {
    val rnd = new scala.util.Random(17)
    def words(n: Int) = Seq.fill(n)(s"u${rnd.nextInt(1000000)}").mkString(" ")
    val shared = (1 to 12).map(i => s"common$i").mkString(" ")
    val boiler = "standard footer text appears everywhere always"
    val df = (Seq(
      (1L, words(20) + " " + shared + " " + boiler),
      (2L, shared + " " + words(20) + " " + boiler)) ++
      (3L to 80L).map(i => (i, words(15) + " " + boiler))).toDF("doc_id", "text")
    val pairs = TextAnalysis
      .winnowingOverlapPairs(df, "doc_id", "text", minShared = 2, maxDocsPerFp = 10)
      .as[(Long, Long, Long, Double)].collect()
    // docs 1-2 share the 12-token run (>= 2 fps); boilerplate fps appear in
    // 80 docs > cap so they can't create the all-pairs clique
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)), s"got ${pairs.toSeq}")
    assert(pairs.head._3 >= 2)
    // containment = shared / min(total fps) — partial overlap sits in (0, 1)
    assert(pairs.head._4 > 0.0 && pairs.head._4 <= 1.0)
    // a full-containment pair: tiny doc embedded verbatim in a larger one
    val sub = Seq(
      (100L, shared),
      (101L, words(30) + " " + shared + " " + words(30))).toDF("doc_id", "text")
    val contained = TextAnalysis
      .winnowingOverlapPairs(sub, "doc_id", "text", minShared = 1, maxDocsPerFp = 10)
      .as[(Long, Long, Long, Double)].collect()
    assert(contained.length == 1 && contained.head._4 == 1.0,
      s"verbatim-contained doc must score containment 1.0, got ${contained.toSeq}")
    intercept[IllegalArgumentException](
      TextAnalysis.winnowingOverlapPairs(df, "doc_id", "text", minShared = 0))
  }

  test("winnowingContainsAgainst: directional containment vs a static corpus") {
    val rnd = new scala.util.Random(29)
    def words(n: Int) = Seq.fill(n)(s"c${rnd.nextInt(1000000)}").mkString(" ")
    val run = (1 to 10).map(i => s"shared$i").mkString(" ")
    val corpus = Seq(
      (100L, words(20) + " " + run + " " + words(20)),
      (101L, words(40))).toDF("doc_id", "text")
    val batch = Seq(
      (1L, run),                          // fully contained in corpus 100
      (2L, words(10) + " " + run),        // partially contained
      (3L, words(25))).toDF("doc_id", "text") // novel
    val out = TextAnalysis
      .winnowingContainsAgainst(corpus, batch, "doc_id", "text", minShared = 1)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._4))).toMap
    assert(out(1L)._1 == 100L && out(1L)._2 == 1.0,
      s"verbatim batch doc must have containment 1.0, got $out")
    assert(out(2L)._1 == 100L && out(2L)._2 > 0.0 && out(2L)._2 < 1.0)
    assert(!out.contains(3L), "novel doc must not pair")
  }

  test("heavyHitterNgrams equals the exact GROUP BY/HAVING on a long-tailed corpus") {
    val rnd = new scala.util.Random(7)
    // 3 heavy bigrams repeated massively + a long tail of singletons
    val heavy = Seq("alpha beta", "beta gamma", "gamma delta")
    val docs =
      (0 until 200).map(i => (i.toLong, heavy(i % 3))) ++
        (200 until 1200).map(i =>
          (i.toLong, s"t${rnd.nextInt(1000000)}x$i t${rnd.nextInt(1000000)}y$i"))
    val df = docs.toDF("id", "text")
    def exact(minCount: Long) = df
      .select(explode(Decontaminate.ngrams(col("text"), 2)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
      .orderBy(col("n").desc, col("gram"))
      .as[(String, Long)].collect().toSeq
    val got = TextAnalysis.heavyHitterNgrams(df, "text", 2, minCount = 10L)
      .as[(String, Long)].collect().toSeq
    assert(got == exact(10L))
    assert(got.map(_._1).toSet == heavy.toSet)
    // threshold is inclusive and exact-count-based (sketch overestimates
    // must not admit a gram whose true count is below minCount)
    val edge = TextAnalysis.heavyHitterNgrams(df, "text", 2, minCount = 67L)
      .as[(String, Long)].collect().toSeq
    assert(edge == exact(67L))
    intercept[IllegalArgumentException](
      TextAnalysis.heavyHitterNgrams(df, "text", 0, 1L))
    intercept[IllegalArgumentException](
      TextAnalysis.heavyHitterNgrams(df, "text", 2, 0L))
    intercept[IllegalArgumentException](
      TextAnalysis.heavyHitterNgrams(df, "text", 2, 10L, eps = 0.0))
    intercept[IllegalArgumentException](
      TextAnalysis.heavyHitterNgrams(df, "text", 2, 10L, confidence = 1.0))
  }

  // --- r11 review regressions: the non-empty-token convention ---

  test("blank and whitespace-only text has zero tokens everywhere") {
    val df = Seq(
      (1L, "one two three"),
      (2L, ""), // split(trim(x)) alone leaves a phantom '' here
      (3L, "   \t  "),
      (4L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val r = df.select(
      col("id"),
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.linearScore(col("text"), Array.fill(16)(7L)).as("s"),
      TextAnalysis.allMarkerCounts(col("text")).getItem(1).as("en"))
      .collect().map(x => x.getLong(0) -> (x.get(1), x.get(2), x.get(3))).toMap
    assert(r(1L) == ((3, 21L, 0))) // 3 tokens × weight 7
    assert(r(2L) == ((0, 0L, 0))) // no phantom md5("")-bucket weight
    assert(r(3L) == ((0, 0L, 0)))
    assert(r(4L) == ((null, null, null))) // null text stays null
    // quality features: blank doc gets a NULL distinct_ratio, not 0/0
    val qf = TextAnalysis.qualityFeatures(df, "id", "text")
      .where(col("id") === 2L).head()
    assert(qf.getAs[Int]("n_tokens") == 0)
    assert(qf.isNullAt(qf.fieldIndex("distinct_ratio")))
    // chunker: blank docs emit NO chunks (used to emit one empty chunk)
    val chunks = TextAnalysis.chunkByTokens(df, "id", "text", maxTokens = 2)
      .select(col("id")).as[Long].collect()
    assert(!chunks.contains(2L) && !chunks.contains(3L))
    assert(chunks.count(_ == 1L) == 2) // "one two" + "three"
    // rule validation
    intercept[IllegalArgumentException](
      TextAnalysis.qualityKeep(col("text"), TextAnalysis.QualityRules(minTokens = 0)))
  }

  test("bigramNovelty raises on a null doc id instead of reporting (0, 0)") {
    val df = Seq((Some(1L), "a b a b"), (None, "a b a b"))
      .toDF("id", "text")
    val e = intercept[Exception](
      TextAnalysis.bigramNovelty(df, "id", "text", minCount = 2L).collect())
    assert(e.getMessage.contains("bigramNovelty"), e.getMessage)
  }

  test("dropFrequentLines: frequency key normalizes, blanks exempt, order kept") {
    val docs = Seq(
      (1L, "Site Nav  Home\nbody one\n\ntail 1"),
      (2L, "site nav home\nbody two\n\ntail 2"),
      (3L, "SITE NAV HOME\nbody three\n\ntail 3"),
      // doc whose EVERY non-blank line is boilerplate
      (4L, "site  nav home\nSite Nav Home")
    ).toDF("id", "text")
    val out = TextAnalysis.dropFrequentLines(docs, "id", "text", minDocs = 3)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // the header's four spellings share one normalized key (count 4 >= 3)
    assert(out(1L)._2 == "body one\n\ntail 1" && out(1L)._3 == 4 && out(1L)._4 == 1)
    assert(out(2L)._2 == "body two\n\ntail 2")
    assert(out(3L)._2 == "body three\n\ntail 3")
    // all lines dropped -> empty text, counts still reported
    assert(out(4L)._2 == "" && out(4L)._3 == 2 && out(4L)._4 == 2)
    // blank lines never count toward frequency even though all docs share them
    assert(out(1L)._2.contains("\n\n"))
    // order preservation with an interleaved boilerplate line
    val ord = Seq(
      (1L, "a\nX\nb"), (2L, "X\nc"), (3L, "d\nX")).toDF("id", "text")
    val o = TextAnalysis.dropFrequentLines(ord, "id", "text", minDocs = 3)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(o == Map(1L -> "a\nb", 2L -> "c", 3L -> "d"))
    intercept[IllegalArgumentException](
      TextAnalysis.dropFrequentLines(docs, "id", "text", minDocs = 1))
  }
}
