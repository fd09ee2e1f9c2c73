package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.ops.Lexical
import graft.ops.Lexical.PostingsSnapshot

/** Streaming ingestion with INCREMENTAL POSTINGS MAINTENANCE — the lexical
  * twin of [[IndexIngest]]: each micro-batch of new documents appends its
  * exploded term postings and doc lengths into the bucketed snapshot
  * tables and its df/stats deltas into the log-structured sides
  * ([[Lexical.appendPostings]]), so [[Lexical.bm25BulkTopK]]'s snapshot
  * overload serves fresh-corpus BM25 BETWEEN micro-batches without ever
  * re-tokenizing the accumulated corpus. `foreachBatch`, so any streaming
  * source works and the batch artifact machinery is reused verbatim.
  *
  * At scale: per-batch work is one tokenize+explode over the batch plus
  * bucketed appends — cost ∝ batch, never ∝ corpus. The df fold the
  * reader performs stays a term-bucketed exchange-free aggregation whose
  * input grows by one delta row per (term, batch); compact on a schedule
  * by re-running [[Lexical.writePostings]] over the accumulated table when
  * batch counts get large (the log-structured-merge convention).
  *
  * Same one-logical-source-per-prefix and at-least-once caveats as
  * [[IndexIngest]]: the checkpoint keys on the snapshot prefix, and a
  * crash between the appends and the checkpoint commit replays one batch
  * (double-counting its docs) — dedup upstream for exactly-once.
  */
object PostingsIngest {

  /** Creates a FRESH empty snapshot under `prefix` (dropping any previous
    * one), runs the stream to completion (AvailableNow), and returns the
    * snapshot handle plus the number of micro-batches processed.
    */
  def ingest(
      spark: SparkSession,
      stream: DataFrame,
      idCol: String,
      textCol: String,
      prefix: String,
      buckets: Int,
      checkpointDir: Option[String] = None): (PostingsSnapshot, Long) = {
    // empty batch with the stream's schema seeds the four tables (and
    // clears any stale location) through the exact writePostings path
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], stream.schema)
    val snapshot = Lexical.writePostings(empty, idCol, textCol, prefix, buckets)
    val checkpoint = checkpointDir.getOrElse {
      val loc = spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(s"${prefix}_postings"))
      s"$loc/_graft_checkpoint"
    }
    val batches = new java.util.concurrent.atomic.AtomicLong(0L)
    val query = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          Lexical.appendPostings(batch, snapshot, textCol)
          batches.incrementAndGet(): Unit
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    (snapshot, batches.get())
  }
}
