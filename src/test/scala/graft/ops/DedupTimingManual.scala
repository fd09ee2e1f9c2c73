package graft.ops

// Manual timing harness (not a CI assertion): run with
//   sbt "testOnly graft.ops.DedupTimingManual"
// against sf0.1 to see per-strategy steady-state seconds.
class DedupTimingManual extends graft.SparkSpec {
  // `ignore` -> `test` to run; keeps CI fast and contention-free.
  ignore("timing: near-dup strategies at sf0.1") {
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def tm(tag: String)(f: => Long): Unit = {
      f // warm
      val t = System.nanoTime()
      val n = f
      info(f"$tag: ${(System.nanoTime() - t) / 1e9}%.2f s ($n rows)")
    }
    tm("simhash")(Dedup.simhashNearDupPairs(df, "doc_id", "text").count())
    tm("minhash")(Dedup.minhashNearDupPairs(df, "doc_id", "text").count())
    tm("invindex")(Dedup.invertedIndexNearDupPairs(df, "doc_id", "text").count())
  }
}
