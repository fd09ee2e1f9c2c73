package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.ivf.{IndexStore, IvfBuilder}

/** Streaming ingestion with INCREMENTAL INDEX MAINTENANCE: each micro-batch
  * appends its rows to a managed Parquet table and indexes ONLY the files
  * it appended (`IvfBuilder.extend` — the first batch falls back to a full
  * build that trains the table's shared centroid set; every later batch
  * assigns under those centroids and writes per-file sidecars from the
  * executors). The stream side is `foreachBatch`, so any streaming source
  * works and the batch IvfBuilder machinery is reused verbatim — no
  * duplicated indexing logic, and the table is queryable (with index
  * acceleration) BETWEEN micro-batches, which is the operational point of
  * incremental maintenance.
  *
  * At scale: per-batch work is one append + one assignment pass over the
  * appended rows only; driver state stays O(files). The known trade — the
  * shared centroids come from the FIRST batch's sample — is exactly what
  * [[IvfBuilder.extendOrRetrain]]'s drift policy manages; pass
  * `retrainOnDrift = true` to use it per batch (TV-histogram + radius-
  * envelope outlier signals, retrain warm-starts Lloyd).
  */
object IndexIngest {

  /** Runs the stream to completion (AvailableNow) and returns the number of
    * micro-batches processed.
    *
    * ONE LOGICAL SOURCE PER TABLE by default: the checkpoint is keyed by
    * `tableDir` alone, so a later call feeding the SAME table from a
    * DIFFERENT source would resume against the first source's committed
    * state (offset mismatch or mis-resume). Ingesting one table from
    * several sources needs an explicit per-source `checkpointDir`.
    *
    * RECOVERY: the checkpoint lives INSIDE the table directory by default
    * (`_graft_checkpoint` — the underscore prefix hides it from Spark's
    * file listing, the `_spark_metadata` convention), so a re-run after a
    * mid-stream failure resumes from the last committed batch instead of
    * re-appending everything from scratch. The remaining exposure is the
    * standard foreachBatch at-least-once window: a crash BETWEEN the
    * parquet append and the checkpoint commit replays that one batch on
    * restart (duplicating its rows) — callers needing exactly-once should
    * ingest into per-batch subdirectories keyed by batchId or dedup on a
    * key downstream.
    */
  def ingest(
      spark: SparkSession,
      stream: DataFrame,
      tableDir: String,
      column: String,
      store: IndexStore = IndexStore.default,
      retrainOnDrift: Boolean = false,
      filesPerBatch: Int = 1,
      checkpointDir: Option[String] = None,
      maintainSq8: Boolean = false): Long = {
    require(filesPerBatch > 0, "filesPerBatch must be > 0")
    val checkpoint = checkpointDir.getOrElse(s"$tableDir/_graft_checkpoint")
    val batches = new java.util.concurrent.atomic.AtomicLong(0L)
    val query = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          batch.coalesce(filesPerBatch).write.mode("append").parquet(tableDir)
          if (retrainOnDrift) {
            IvfBuilder.extendOrRetrain(
              spark, tableDir, IvfBuilder.Config(column), store): Unit
          } else {
            IvfBuilder.extend(spark, tableDir, IvfBuilder.Config(column), store): Unit
          }
          // SQ8's fixed symmetric grid is codebook-free, so per-batch
          // sidecar maintenance only encodes the NEW files — the quantized
          // search tier stays live between micro-batches at append cost.
          // (PQ is deliberately not maintained here: its codebook trains on
          // a whole-table sample, so per-batch ensure would rescan the
          // grown table every batch — run PqSidecar.ensure on a schedule.)
          if (maintainSq8) {
            graft.ivf.Sq8Sidecar.ensure(spark, tableDir, column, store)
          }
          batches.incrementAndGet(): Unit
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    batches.get()
  }
}
