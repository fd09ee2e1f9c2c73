package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SegmentDedupSpec extends SparkSpec {
  import spark.implicits._

  test("paragraphDedup keeps a repeated paragraph only at its first (id, idx)") {
    val docs = Seq(
      (1L, "alpha beta\n\nshared footer"),
      (2L, "shared footer\n\ngamma delta"),
      (3L, "shared footer")).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs, "doc_id", "text")
      .select("doc_id", "dedup_text").as[(Long, String)].collect().toMap
    assert(out(1L) == "alpha beta\n\nshared footer") // first sighting: doc 1 idx 1
    assert(out(2L) == "gamma delta") // footer already seen
    assert(out(3L) == "") // lost its only paragraph
  }

  test("paragraphDedup keeps only the first occurrence WITHIN a document") {
    val docs = Seq((1L, "x\n\nx\n\ny")).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs, "doc_id", "text")
      .select("dedup_text").as[String].head()
    assert(out == "x\n\ny")
  }

  test("paragraphDedup preserves original segment order in the reassembly") {
    val docs = Seq(
      (1L, "c\n\nb\n\na"),
      (2L, "a\n\nz\n\nc")).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs, "doc_id", "text")
      .select("doc_id", "dedup_text").as[(Long, String)].collect().toMap
    assert(out(1L) == "c\n\nb\n\na")
    assert(out(2L) == "z") // a and c both first-seen in doc 1
  }

  test("blockDedup: exact duplicate document empties entirely; unique survives") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6"),
      (2L, "w1 w2 w3 w4 w5 w6"), // exact dup of doc 1 — every block repeats
      (3L, "u1 u2 u3 u4 u5 u6")).toDF("doc_id", "text")
    val out = Dedup.blockDedup(docs, "doc_id", "text", wordsPerBlock = 4)
      .select("doc_id", "dedup_text").as[(Long, String)].collect().toMap
    assert(out(1L) == "w1 w2 w3 w4 w5 w6")
    assert(out(2L) == "")
    assert(out(3L) == "u1 u2 u3 u4 u5 u6")
  }

  test("blockDedup final short block is its own segment") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    // blocks of 2: [a b] [c d] [e]
    val segs = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("i", "w")))
    assert(segs.count() == 5)
    val out = Dedup.blockDedup(docs, "doc_id", "text", wordsPerBlock = 2)
      .select("dedup_text").as[String].head()
    assert(out == "a b c d e")
  }

  test("blockDedup shared-prefix template drops aligned repeated blocks only") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 own1 own2 own3 own4"),
      (2L, "t1 t2 t3 t4 oth1 oth2 oth3 oth4")).toDF("doc_id", "text")
    val out = Dedup.blockDedup(docs, "doc_id", "text", wordsPerBlock = 4)
      .select("doc_id", "dedup_text").as[(Long, String)].collect().toMap
    assert(out(1L) == "t1 t2 t3 t4 own1 own2 own3 own4")
    assert(out(2L) == "oth1 oth2 oth3 oth4")
  }

  test("all original columns survive; output-column collision fails fast") {
    val docs = Seq((1L, "a", "extra")).toDF("doc_id", "text", "meta")
    val out = Dedup.blockDedup(docs, "doc_id", "text", 4)
    assert(out.columns.toSeq == Seq("doc_id", "text", "meta", "dedup_text"))
    val clash = docs.withColumn("dedup_text", lit("x"))
    val e = intercept[IllegalArgumentException] {
      Dedup.blockDedup(clash, "doc_id", "text", 4)
    }
    assert(e.getMessage.contains("dedup_text"))
  }

  test("dedupSegments winner rule is min (id, idx) lexicographic, not min idx") {
    // seg "s" occurs at (2, 0) and (1, 5): winner is (1, 5)
    val segments = Seq(
      (2L, 0, "s"),
      (1L, 5, "s"),
      (1L, 0, "other")).toDF("doc_id", "_idx", "_seg")
    val kept = Dedup.dedupSegments(segments, "doc_id", "_idx", "_seg")
      .as[(Long, Int, String)].collect().toSet
    assert(kept == Set((1L, 5, "s"), (1L, 0, "other")))
  }

  test("fixture sanity: dq11 keeps every doc row and never grows a document") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Dedup.blockDedup(
      docs.select(col("doc_id"), col("text")), "doc_id", "text", 16)
    assert(out.count() == docs.count())
    val grew = out
      .where(length(col("dedup_text")) > length(col("text")))
      .count()
    assert(grew == 0)
    // something must actually dedup on this fixture (it has exact dup docs)
    val changed = out.where(col("dedup_text") =!= col("text")).count()
    assert(changed > 0, "expected at least one deduped document on the fixture")
  }
}
