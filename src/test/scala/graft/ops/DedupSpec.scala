package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog tonight"),
    (1L, "the quick brown fox jumps over the lazy cat tonight"), // near-dup of 0
    (2L, "completely different words about spark query engines here now"),
    (3L, "the quick brown fox jumps over the lazy dog tonight"), // exact dup of 0
    (4L, "one two")) // shorter than shingle size 3? no — 2 tokens < 3
    .toDF("doc_id", "text")

  test("shingles builds distinct word n-grams, empty below n tokens") {
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(0L).head == "the quick brown")
    assert(sh(0L).length == 8)
    assert(sh(4L).isEmpty)
  }

  test("exact dedup keeps smallest id per text") {
    val kept = Dedup.exact(docs, col("text"), col("doc_id"))
      .as[Long].collect().sorted
    assert(kept.toSeq == Seq(0L, 1L, 2L, 4L))
  }

  test("minhash near-dup pairs finds the near and exact dup, not the distinct doc") {
    // jaccard(0,1) is 0.6 — use 64 bands × 2 rows so recall at 0.6 is ~1
    // (default 16×8 banding targets the ≥0.9 regime).
    val pairs = Dedup
      .minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.5, bands = 64)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L))) // exact dup, jaccard 1.0
    assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 3L))) // near dups
    assert(!pairs.exists { case (a, b) => a == 2L || b == 2L })
  }

  test("non-integral id columns fail fast with an actionable message") {
    // the group-then-enumerate paths key on the id cast to long: a string
    // id would cast to null (encoder NPE), a double would truncate and
    // could merge distinct ids — the contract is validated at plan time
    val stringIds = docs.withColumn("doc_id", concat(lit("d"), col("doc_id")))
    val doubleIds = docs.withColumn("doc_id", col("doc_id").cast("double"))
    for (bad <- Seq(stringIds, doubleIds)) {
      val e1 = intercept[IllegalArgumentException](
        Dedup.minhashNearDupPairs(bad, "doc_id", "text"))
      assert(e1.getMessage.contains("must be an integral type"))
      val e2 = intercept[IllegalArgumentException](
        Dedup.simhashNearDupPairs(bad, "doc_id", "text"))
      assert(e2.getMessage.contains("doc_id"))
      val e3 = intercept[IllegalArgumentException](
        Dedup.invertedIndexNearDupPairs(bad, "doc_id", "text"))
      assert(e3.getMessage.contains("integral"))
    }
    // int ids remain accepted (widening cast is lossless)
    val intIds = docs.withColumn("doc_id", col("doc_id").cast("int"))
    assert(Dedup.minhashNearDupPairs(intIds, "doc_id", "text", bands = 64)
      .count() > 0)
  }

  test("duplicate id rows do not emit self-pairs") {
    // the same doc ingested twice (dup ROWS, same id) must not surface as
    // a (x, x) near-dup pair from the small-bucket enumeration path
    val dupRows = docs.union(docs.where(col("doc_id") === 0L))
    val pairs = Dedup
      .minhashNearDupPairs(dupRows, "doc_id", "text", threshold = 0.5, bands = 64)
      .as[(Long, Long)].collect().toSet
    assert(pairs.forall { case (a, b) => a != b })
    assert(pairs.contains((0L, 3L)))
  }

  test("simhash and inverted-index pairs agree with minhash on this corpus") {
    val expected = Set((0L, 1L), (0L, 3L), (1L, 3L))
    val sim = Dedup.simhashNearDupPairs(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    val inv = Dedup.invertedIndexNearDupPairs(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(sim == expected)
    assert(inv == expected)
  }

  test("minhash degenerate mass: star pivots bound pairs, clustering still connects it") {
    // 30 identical docs share every band bucket — the unbounded m² hazard
    // for a template family; the cap routes them through star pairs
    val mass = (100L until 130L).map(i => (i, "template template body repeated exactly " +
      "alpha beta gamma delta epsilon zeta eta theta"))
    val df = docs.union(mass.toDF("doc_id", "text"))
    val pairs = Dedup.minhashNearDupPairs(
      df, "doc_id", "text", maxBucketSize = 8, starPivots = 2)
    val collected = pairs.as[(Long, Long)].collect().toSet
    val (massPairs, basePairs) = collected.partition { case (a, b) => a >= 100L }
    assert(basePairs == Set((0L, 1L), (0L, 3L), (1L, 3L)))
    assert(massPairs.forall { case (a, b) => a >= 100L && b >= 100L })
    assert(massPairs.size < 200, s"star cap did not bound: ${massPairs.size} pairs")
    val clusters = Dedup.connectedComponents(pairs.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
      .as[(Long, Long)].collect()
    val massClusters = clusters.filter(_._1 >= 100L).map(_._2).distinct
    assert(massClusters.toSeq == Seq(100L), s"mass split into $massClusters")
    assert(clusters.count(_._1 >= 100L) == 30)
  }

  test("simhash degenerate mass: star pivots bound pairs, clustering still connects it") {
    // 30 identical docs = one mass every block key maps together (every
    // sub-bucket over a cap of 8 — the Zipf-corpus shape), + the base corpus
    val mass = (100L until 130L).map(i => (i, "template template body repeated exactly " +
      "alpha beta gamma delta epsilon zeta eta theta"))
    val df = docs.union(mass.toDF("doc_id", "text"))
    val pairs = Dedup.simhashNearDupPairs(
      df, "doc_id", "text", maxBucketSize = 8, starPivots = 2)
    val collected = pairs.as[(Long, Long)].collect().toSet
    // precision stays exact: mass pairs only within the mass, base pairs as before
    val (massPairs, basePairs) = collected.partition { case (a, b) => a >= 100L }
    assert(basePairs == Set((0L, 1L), (0L, 3L), (1L, 3L)))
    assert(massPairs.forall { case (a, b) => a >= 100L && b >= 100L })
    // star cap engaged: far fewer than the 435 all-pairs of a 30-doc mass
    assert(massPairs.size < 200, s"star cap did not bound: ${massPairs.size} pairs")
    // the clustering consumer sees ONE component covering the whole mass
    val clusters = Dedup.connectedComponents(pairs.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
      .as[(Long, Long)].collect()
    val massClusters = clusters.filter(_._1 >= 100L).map(_._2).distinct
    assert(massClusters.toSeq == Seq(100L), s"mass split into $massClusters")
    assert(clusters.count(_._1 >= 100L) == 30)
  }

  test("pairQuality: canonicalization, exact counts, zero-denominator conventions") {
    val found = Seq((2L, 1L), (1L, 2L), (3L, 4L), (9L, 8L)).toDF("doc_a", "doc_b")
    val truth = Seq((1L, 2L), (4L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val r = Dedup.pairQuality(found, truth)
      .as[(Long, Long, Long, Double, Double, Double)].head()
    // found canonicalizes+dedups to {(1,2),(3,4),(8,9)}; hits = {(1,2),(3,4)}
    assert(r._1 == 3 && r._2 == 3 && r._3 == 2)
    assert(r._4 == 2.0 / 3 && r._5 == 2.0 / 3)
    assert(math.abs(r._6 - 2.0 / 3) < 1e-15)
    val empty = found.where(lit(false))
    val z = Dedup.pairQuality(empty, truth)
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(z._1 == 0 && z._3 == 0 && z._4 == 0.0 && z._5 == 0.0 && z._6 == 0.0)
  }

  test("simhash64 is deterministic and insensitive to small perturbation") {
    val h = docs.select(Dedup.simhash64(split(col("text"), " ")).as("h"))
      .as[Long].collect()
    assert(h(0) == h(3)) // identical text, identical hash
    assert(java.lang.Long.bitCount(h(0) ^ h(1)) <= 16) // one word changed
    assert(java.lang.Long.bitCount(h(0) ^ h(2)) > 10) // unrelated text far
  }

  test("minhashNearDupAgainst finds incoming-vs-corpus pairs only") {
    val corpus = docs.where(col("doc_id") =!= 3L)
    val incoming = docs.where(col("doc_id") === 3L) // exact dup of 0
    val pairs = Dedup
      .minhashNearDupAgainst(corpus, incoming, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    // doc 3 duplicates 0 and near-duplicates 1; never pairs corpus-corpus
    assert(pairs == Set((3L, 0L), (3L, 1L)))
  }

  test("connectedComponents collapses chains to the min-id representative") {
    // components: {1,2,3,9} via a chain (1-2, 2-3, 3-9), {5,7}, and a
    // long path 10-11-12-13-14 that needs >1 propagation round
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (9L, 3L), (5L, 7L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L))
      .toDF("doc_a", "doc_b")
    val expect = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L,
      5L -> 5L, 7L -> 5L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 14L -> 10L)
    // default = the driver union-find fast path (8 edges << the cap)
    val cc = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(cc == expect)
    // the DISTRIBUTED loop (forced via maxLocalEdges = 0) must agree
    // bit-for-bit — the two paths are interchangeable by size threshold
    val ccDist = Dedup
      .connectedComponents(pairs, "doc_a", "doc_b", maxLocalEdges = 0)
      .as[(Long, Long)].collect().toMap
    assert(ccDist == expect)
  }

  test("connectedComponents paths agree on a random graph (local == loop)") {
    val rnd = new scala.util.Random(97)
    // 300 random edges over 120 nodes: multi-round chains, dup edges,
    // self-loops, both orientations
    val pairs = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .toDF("doc_a", "doc_b")
    val local = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    val dist = Dedup
      .connectedComponents(pairs, "doc_a", "doc_b", maxLocalEdges = 0)
      .as[(Long, Long)].collect().toMap
    assert(local == dist)
  }

  test("connectedComponents of an empty pair set is empty; keepRepresentatives passes all") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(empty, "doc_a", "doc_b")
    assert(cc.count() == 0)
    val kept = Dedup.keepRepresentatives(docs, "doc_id", cc)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("keepRepresentatives drops non-representative members only") {
    val pairs = Seq((0L, 1L), (0L, 3L)).toDF("doc_a", "doc_b")
    val clusters = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
    val kept = Dedup.keepRepresentatives(docs, "doc_id", clusters)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(0L, 2L, 4L)) // 1 and 3 collapse into 0
  }

  test("embedding near-dup pairs by cosine threshold") {
    val vecs = Seq(
      (0L, Seq(1f, 0f, 0f)),
      (1L, Seq(0.99f, 0.1f, 0f)), // ~cos 0.995 with 0
      (2L, Seq(0f, 1f, 0f)))
      .toDF("id", "v")
      .select(col("id"), col("v").cast("array<float>").as("v"))
    val pairs = Dedup.embeddingNearDupPairs(vecs, "id", "v", 0.9)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  // d0/d1 share the 4-token run "a b c d"; d3 repeats its own 3-gram
  // (within-doc occurrences count); d5 has TWO duplicated runs separated by
  // a gap > n (distinct islands); d2 unique; d4 shorter than n.
  private val spanDocs = Seq(
    (0L, "a b c d e f"),
    (1L, "x y a b c d z"),
    (2L, "p q r s t u"),
    (3L, "w w w w"),
    (4L, "m n"),
    (5L, "g1 g2 g3 s1 s2 s3 s4 g1 g2 g3"))
    .toDF("doc_id", "text")

  test("duplicatedNgramSpans merges overlapping windows, splits over gaps") {
    val spans = Dedup.duplicatedNgramSpans(spanDocs, "doc_id", "text", 3)
      .as[(Long, Int, Int)].collect().toSet
    assert(spans == Set(
      (0L, 0, 3), // "a b c d"
      (1L, 2, 5), // "a b c d"
      (3L, 0, 3), // self-repeated "w w w" covers the whole doc
      (5L, 0, 2), (5L, 7, 9))) // two islands, gap 7-2 > 3
  }

  test("dropDuplicatedSpans scrubs span tokens, passes clean docs through") {
    val out = Dedup.dropDuplicatedSpans(spanDocs, "doc_id", "text", 3)
      .as[(Long, String)].collect().toMap
    assert(out == Map(
      0L -> "e f",
      1L -> "x y z",
      2L -> "p q r s t u",
      3L -> "", // fully duplicated doc scrubs to empty
      4L -> "m n",
      5L -> "s1 s2 s3 s4"))
  }

  test("editDistance1Pairs: complete for every ed<=1 shape, exact verify, cap bites") {
    val df = Seq(
      (1L, "table"),
      (2L, "fable"),   // substitution of 1
      (3L, "tble"),    // deletion from 1
      (4L, "stable"),  // insertion into 1
      (5L, "table"),   // exact dup of 1
      (6L, "chair"),   // unrelated
      (7L, "")).toDF("doc_id", "key") // empty key: self-variant only
    val pairs = Dedup.editDistance1Pairs(df, "doc_id", "key")
      .as[(Long, Long, Int)].collect().toSet
    // all four ed<=1 shapes vs doc 1 found; transitives only where true
    assert(pairs.contains((1L, 2L, 1)) && pairs.contains((1L, 3L, 1)) &&
      pairs.contains((1L, 4L, 1)) && pairs.contains((1L, 5L, 0)))
    assert(pairs.contains((2L, 5L, 1)) && pairs.contains((3L, 5L, 1)))
    // "fable"~"tble" is ed 2 — candidates may collide but verify kills it
    assert(!pairs.exists(p => Set((2L, 3L), (2L, 4L)).contains((p._1, p._2))))
    assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L || p._1 == 7L || p._2 == 7L))
    // hot-variant cap: 100 single-char keys all share the "" variant;
    // cap 2 suppresses the clique entirely
    val hot = (0 until 100).map(i => (i.toLong, ('a' + i % 26).toChar.toString))
      .toDF("doc_id", "key")
    val capped = Dedup.editDistance1Pairs(hot, "doc_id", "key", maxBucket = 2)
    // only exact-dup pairs (same letter share their self variant too) survive
    assert(capped.as[(Long, Long, Int)].collect().forall(_._3 == 0))
    intercept[IllegalArgumentException](
      Dedup.editDistance1Pairs(df, "doc_id", "key", maxBucket = 1))
  }

  // --- r11 review regressions ---

  test("minhash banding refuses bands that don't divide numHashes") {
    // bands > numHashes: rowsPerBand 0 → one corpus-wide bucket per band
    intercept[IllegalArgumentException](
      Dedup.minhashNearDupPairs(docs, "doc_id", "text", numHashes = 4, bands = 8))
    // non-dividing bands: tail hashes silently unused
    intercept[IllegalArgumentException](
      Dedup.minhashNearDupPairs(docs, "doc_id", "text", numHashes = 128, bands = 7))
    intercept[IllegalArgumentException](
      Dedup.minhashNearDupAgainst(docs, docs, "doc_id", "text", numHashes = 16, bands = 3))
  }

  test("hammingNearDupPairs equals brute force on random 64-bit signatures") {
    val rnd = new scala.util.Random(17)
    // 300 random signatures + implanted near-pairs at known distances
    val base = (0 until 300).map(i => (i.toLong, rnd.nextLong()))
    val implanted = base.take(20).zipWithIndex.map { case ((id, h), i) =>
      // flip exactly i%8 bits of h for a twin at distance i%8
      var twin = h
      (0 until i % 8).foreach(b => twin ^= 1L << (b * 7 + 3))
      (1000L + id, twin)
    }
    val all = base ++ implanted
    val df = all.map { case (id, h) => (id, h >>> 32, h & 0xFFFFFFFFL) }
      .toDF("doc_id", "hash_hi", "hash_lo")
    val maxDist = 5
    val got = Dedup
      .hammingNearDupPairs(df, "doc_id", "hash_hi", "hash_lo", maxDist)
      .as[(Long, Long)].collect().toSet
    val want = (for {
      i <- all.indices; j <- (i + 1) until all.length
      if java.lang.Long.bitCount(all(i)._2 ^ all(j)._2) <= maxDist
    } yield (math.min(all(i)._1, all(j)._1), math.max(all(i)._1, all(j)._1))).toSet
    assert(want.nonEmpty && got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    // invalid configs refuse: bands must exceed maxDist (completeness) and
    // divide 64
    intercept[IllegalArgumentException](
      Dedup.hammingNearDupPairs(df, "doc_id", "hash_hi", "hash_lo", 8, numBands = 8))
    intercept[IllegalArgumentException](
      Dedup.hammingNearDupPairs(df, "doc_id", "hash_hi", "hash_lo", 3, numBands = 7))
  }

  test("hammingNearDupPairs degenerate mass: star pairs keep the component connected") {
    // 50 IDENTICAL signatures with a tiny cap: the mass path must emit
    // bounded star pairs that still collapse to ONE cluster downstream
    val df = (0 until 50).map(i => (i.toLong, 7L, 9L))
      .toDF("doc_id", "hash_hi", "hash_lo")
    val pairs = Dedup.hammingNearDupPairs(
      df, "doc_id", "hash_hi", "hash_lo", maxDist = 2, maxBucketSize = 8)
    val nPairs = pairs.count()
    assert(nPairs < 50L * 49 / 2, "mass must emit bounded star pairs, not all-pairs")
    val clusters = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .select("cluster_id").distinct().count()
    assert(clusters == 1L, "the mass must remain one component through the pivots")
  }

  test("connectedComponents raises on null edge endpoints in both size regimes") {
    val nullPairs = Seq((Some(1L), Some(2L)), (Some(3L), None))
      .toDF("doc_a", "doc_b")
    // small regime: the raise fires during the local probe collect
    val e1 = intercept[Exception](
      Dedup.connectedComponents(nullPairs, "doc_a", "doc_b").collect())
    assert(e1.getMessage.contains("connectedComponents"), e1.getMessage)
    // forced-distributed regime (cap 0): same in-plan guard, same failure
    val e2 = intercept[Exception](
      Dedup.connectedComponents(nullPairs, "doc_a", "doc_b", maxLocalEdges = 0)
        .collect())
    assert(e2.getMessage.contains("connectedComponents"), e2.getMessage)
  }
}
