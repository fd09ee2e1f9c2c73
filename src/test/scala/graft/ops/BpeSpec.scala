package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainMerges reproduces the hand-computed merge sequence") {
    // corpus: "abab" x3, "abc" x2, "cc" x1
    val docs = Seq("abab abab", "abab abc", "abc cc").toDF("text")
    // char pair counts (overlapping): word "abab": (a,b)x2 (b,a)x1
    //   freq(abab)=3 → (a,b)+=6 (b,a)+=3; "abc" x2 → (a,b)+=2 (b,c)+=2;
    //   "cc" x1 → (c,c)+=1
    // merge 0: (a,b) cnt 8 → symbol "ab"
    // then "abab"→[ab,ab], "abc"→[ab,c]: pairs (ab,ab)x3, (ab,c)x2, (c,c)x1
    // merge 1: (ab,ab) cnt 3; then merge 2: (ab,c) cnt 2; merge 3: (c,c) 1
    val merges = Bpe.trainMerges(docs, "text", 4)
    assert(merges.map(m => (m.rank, m.symA, m.symB, m.cnt)) == Seq(
      (0, "a", "b", 8L), (1, "ab", "ab", 3L), (2, "ab", "c", 2L), (3, "c", "c", 1L)))
    // exhaustion fails fast with a clear message
    val e = intercept[IllegalArgumentException](Bpe.trainMerges(docs, "text", 10))
    assert(e.getMessage.contains("exhausted"))
  }

  test("tokenCount applies merges in rank order with word-boundary isolation") {
    val docs = Seq("abab abc cc", "ababab", "a b ab", "").toDF("text")
    val merges = Seq(
      Bpe.Merge(0, "a", "b", 0L), Bpe.Merge(1, "ab", "ab", 0L))
    val got = docs
      .select(Bpe.tokenCount(col("text"), merges).as("n"))
      .as[Int].collect().toSeq
    // "abab abc cc": abab→[abab], abc→[ab,c], cc→[c,c] → 1+2+2 = 5
    // "ababab": [ab,ab,ab] → merge1 L-to-R: [abab, ab] → 2
    // "a b ab": merges can't cross spaces → [a],[b],[ab] → 3
    // "": no symbols → 0
    assert(got == Seq(5, 2, 3, 0))
    // zero merges = character count (whitespace excluded)
    val chars = docs.select(Bpe.tokenCount(col("text"), Nil).as("n"))
      .as[Int].collect().toSeq
    assert(chars == Seq(9, 6, 4, 0))
  }

  test("tokenIdRows: ids are the lexicographic vocab, counts agree, OOV is -1") {
    val docs = Seq((1L, "abab abc"), (2L, "cc")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, "text", 2)
    val vocab = Bpe.vocabulary(docs, "text", merges)
      .as[(String, Long)].collect().toMap
    // vocab ids are dense 1..V in lexicographic symbol order
    assert(vocab.values.toSeq.sorted == (1L to vocab.size))
    assert(vocab.keys.toSeq.sorted.zipWithIndex.forall { case (s, i) => vocab(s) == i + 1 })
    val rows = Bpe.tokenIdRows(docs, "doc_id", "text", merges)
      .as[(Long, Int, Long)].collect().sorted.toSeq
    // positions are dense 1..n per doc; every id resolves (no -1 here)
    val byDoc = rows.groupBy(_._1)
    byDoc.foreach { case (_, rs) => assert(rs.map(_._2).sorted.toSeq == (1 to rs.length)) }
    assert(rows.forall(_._3 >= 1))
    // per-doc row count == tokenCount under the same merges
    val counts = docs.select(col("doc_id"), Bpe.tokenCount(col("text"), merges))
      .as[(Long, Int)].collect().toMap
    byDoc.foreach { case (d, rs) => assert(rs.length == counts(d)) }
    // encoding with a FOREIGN vocab marks unknown symbols -1, keeps positions
    val tiny = Bpe.vocabulary(Seq((9L, "zz")).toDF("doc_id", "text"), "text", Nil)
    val oov = Bpe.tokenIdRows(docs, "doc_id", "text", merges, vocab = Some(tiny))
      .as[(Long, Int, Long)].collect()
    assert(oov.length == rows.length && oov.forall(_._3 == -1L))
  }

  test("merged token counts never exceed character counts and shrink monotonically") {
    val docs = spark.read
      .option("pathGlobFilter", "documents.parquet")
      .parquet("/root/testdata/sf0.001")
    val merges = Bpe.trainMerges(docs, "text", 6)
    assert(merges.map(_.rank) == (0 until 6))
    // counts with k merges are non-increasing in k
    val counts = (0 to 6).map { k =>
      docs.agg(sum(Bpe.tokenCount(col("text"), merges.take(k)))).head().getLong(0)
    }
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a })
    assert(counts.last < counts.head) // six merges actually merged something
  }

  test("trainMergesLocal produces the identical merge sequence to trainMerges") {
    // tie- and overlap-heavy corpus: equal counts exercise the
    // (cnt DESC, sym_a, sym_b) rule, "aaaa" the overlap-count vs
    // non-overlapping-merge asymmetry, multi-char symbols the later rounds
    val docs = Seq(
      "abab abab abc", "cc dd cc dd", "aaaa aaa", "xy xz yz xy",
      "the the quick quick", "ababab").toDF("text")
    val n = 12
    val seqMerges = Bpe.trainMerges(docs, "text", n)
    val locMerges = Bpe.trainMergesLocal(docs, "text", n)
    assert(locMerges == seqMerges)
    // exhaustion parity
    val e = intercept[IllegalArgumentException](
      Bpe.trainMergesLocal(Seq("ab").toDF("text"), "text", 5))
    assert(e.getMessage.contains("exhausted"))
    // maxWords bound fails fast
    val big = intercept[IllegalArgumentException](
      Bpe.trainMergesLocal(docs, "text", 2, maxWords = 3))
    assert(big.getMessage.contains("maxWords"))
  }
}
