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
    * re-appending everything from scratch. The remaining exposure under
    * the default `exactlyOnce = false` is the standard foreachBatch
    * at-least-once window: a crash BETWEEN the parquet append and the
    * checkpoint commit replays that one batch on restart (duplicating its
    * rows). `exactlyOnce = true` closes it via
    * [[appendBatchExactlyOnce]]: batch files land under DETERMINISTIC
    * batchId-keyed names behind a commit marker, so every replay window
    * (before the move, mid-move, after the move but before the marker)
    * re-lands on the same names instead of duplicating — see that
    * method's scaladoc for the atomicity requirements (rename-atomic
    * filesystems; on S3-class stores prefer the default + downstream
    * dedup). Markers and file names are scoped by a SOURCE TAG derived
    * from the checkpoint path, so the multi-source-per-table recipe
    * (per-source `checkpointDir`) keeps exactly-once per source — two
    * sources' batch 0 are different commits, not a clobber.
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
      maintainSq8: Boolean = false,
      exactlyOnce: Boolean = false): Long = {
    require(filesPerBatch > 0, "filesPerBatch must be > 0")
    val checkpoint = checkpointDir.getOrElse(s"$tableDir/_graft_checkpoint")
    val batches = new java.util.concurrent.atomic.AtomicLong(0L)
    val query = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          if (exactlyOnce)
            appendBatchExactlyOnce(spark, batch, tableDir, batchId,
              filesPerBatch, sourceTag(checkpoint)): Unit
          else
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

  /** Stable per-source scope for exactly-once artifacts: the checkpoint
    * path IS the source identity (foreachBatch batchIds are meaningful
    * only within one checkpoint), hashed to a short filesystem-safe tag.
    */
  private[streaming] def sourceTag(checkpoint: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(checkpoint.getBytes("UTF-8"))
    md.take(4).map(x => f"${x & 0xFF}%02x").mkString
  }

  /** Idempotent batch append — the exactly-once leg of [[ingest]].
    *
    * Protocol: (1) if `tableDir/_graft_commits/<tag>-<batchId>` exists the
    * batch already committed — return false, write nothing (the replay
    * path); (2) write the batch to a keyed staging dir; (3) delete any
    * `b<tag>-<batchId>-p*.parquet` left by a crashed prior attempt;
    * (4) rename the staged part files into the table under DETERMINISTIC
    * names `b<tag>-<batchId>-p<i>.parquet`; (5) create the commit marker via
    * temp+rename; (6) drop staging. Every crash window replays into the
    * same names behind the same marker — a replayed batch can overwrite
    * its own files but can never duplicate rows, because foreachBatch
    * replays a batchId with the same checkpointed source offsets. The
    * underscore-prefixed staging/commits dirs are invisible to Spark's
    * file listing, so readers never see uncommitted rows mid-move EXCEPT
    * files from a crashed attempt of the CURRENT batch (bounded: one
    * batch, replaced on replay — the same visibility a plain append gives
    * a crashed job).
    *
    * Requires rename-atomicity from the filesystem (HDFS, POSIX). On
    * S3-class stores rename is copy+delete — keep `exactlyOnce = false`
    * there and dedup downstream.
    */
  private[streaming] def appendBatchExactlyOnce(
      spark: SparkSession,
      batch: org.apache.spark.sql.Dataset[Row],
      tableDir: String,
      batchId: Long,
      filesPerBatch: Int,
      tag: String = "default"): Boolean = {
    import org.apache.hadoop.fs.Path
    val table = new Path(tableDir)
    val fs = table.getFileSystem(spark.sessionState.newHadoopConf())
    val marker = new Path(table, s"_graft_commits/$tag-$batchId")
    if (fs.exists(marker)) return false
    val staging = new Path(table, s"_graft_staging_$tag-$batchId")
    batch.coalesce(filesPerBatch).write.mode("overwrite")
      .parquet(staging.toString)
    val parts = fs.listStatus(staging).map(_.getPath)
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val stale = fs.globStatus(new Path(table, s"b$tag-$batchId-p*.parquet"))
    if (stale != null) stale.foreach(s => fs.delete(s.getPath, false): Unit)
    parts.zipWithIndex.foreach { case (p, i) =>
      val dst = new Path(table, s"b$tag-$batchId-p$i.parquet")
      if (!fs.rename(p, dst))
        throw new java.io.IOException(s"exactly-once move failed: $p -> $dst")
    }
    fs.mkdirs(marker.getParent): Unit
    val tmp = new Path(table, s"_graft_commits/.$tag-$batchId.tmp")
    fs.create(tmp, true).close()
    if (!fs.rename(tmp, marker) && !fs.exists(marker))
      throw new java.io.IOException(s"exactly-once commit failed: $marker")
    fs.delete(staging, true): Unit
    true
  }
}
