package graft

import org.apache.spark.sql.DataFrame

/** The one timing harness shared by every bench main ([[Bench]],
  * [[tools.ScaleBench]], [[tools.TextScaleBench]]) — min-of-`reps` after
  * the caller's warmup, full materialization, -1 marks a failed query.
  * Centralized so a methodology change can never make the benches'
  * numbers subtly incomparable.
  */
private[graft] object BenchTiming {

  /** Default timed repetitions (post-warmup); min is reported — steady-state
    * JIT/codegen/page-cache, robust against co-tenant load spikes (single
    * timed runs showed 3-19x outliers on untouched queries, BENCHNOTES.md).
    */
  val DefaultReps = 2

  def time(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  /** Min over `reps` timed runs; -1 marks a failed query, logged under
    * `label` when one is given.
    *
    * The DataFrame cache is cleared before EVERY timed run: an operator
    * that `persist`s an intermediate builds an identical plan on the next
    * invocation and Spark's CacheManager serves it from cache, silently
    * excluding the persisted computation from the timed reps (measured:
    * the old minhash banded-signature persist hid ~2.5 s/rep at 500k
    * docs). Clearing keeps every rep a full per-call cost. Deliberate
    * cross-call caches that are NOT DataFrame persists — the decoded-index
    * LRU, OS page cache, JIT — stay warm, as they would for a production
    * repeat query.
    */
  def timeMin(label: String = "", reps: Int = DefaultReps)(f: => Unit): Double =
    try
      Seq.fill(reps) {
        org.apache.spark.sql.SparkSession.getActiveSession
          .foreach(_.catalog.clearCache())
        time(f)
      }.min
    catch {
      case e: Throwable =>
        if (label.nonEmpty) System.err.println(s"[$label] FAIL: $e")
        -1.0
    }

  /** Forces full materialization — a plain `count()` would let column
    * pruning skip the very projections being measured.
    */
  def materialize(df: DataFrame): Unit = {
    df.queryExecution.toRdd.count(): Unit
  }
}
