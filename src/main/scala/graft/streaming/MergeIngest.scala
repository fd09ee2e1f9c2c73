package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Streaming CDC apply: each micro-batch of change rows MERGEs into a
  * versioned base snapshot via [[graft.ops.Corpus.mergeUpsert]] (updates
  * win, tombstones delete, `seqCol` resolves multi-op keys WITHIN a
  * batch; ACROSS batches, arrival order wins — the CDC stream contract).
  * The table is a directory of full snapshots `v0, v1, …`: batch `b`
  * reads the latest version and writes `v{b+1}`, so (a) readers between
  * micro-batches always see a complete consistent snapshot (the
  * operational point — no torn reads during the merge), (b) a replayed
  * batch after a crash OVERWRITES its own output version instead of
  * double-applying (idempotent against foreachBatch's at-least-once
  * window), and (c) older versions remain readable until pruned
  * ([[prune]]) — snapshot-diff auditing ([[graft.ops.Corpus.diffSnapshots]])
  * composes directly.
  *
  * At scale each merge shuffles only the batch (update keys broadcast to
  * the base's anti-join — see mergeUpsert's plan note) but RE-WRITES the
  * whole snapshot: right for dimension/metadata-sized tables (the usual
  * CDC targets) or modest refresh cadence. A corpus-sized, high-cadence
  * target wants partitioned rewrites (only files holding merged keys) —
  * that variant composes from [[graft.ops.Layout.writeBucketed]] +
  * per-bucket merge and is out of scope here.
  */
object MergeIngest {

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** A version dir is committed only once its `_SUCCESS` marker exists —
    * parquet directory writes are not atomic, so a max-`v<N>` pick without
    * this check could hand a reader (or a post-crash merge) a mid-write or
    * half-written snapshot (round-10 advice item). The marker is the
    * FileOutputCommitter's own commit record, written after every part
    * file lands.
    */
  private def isCommitted(
      f: org.apache.hadoop.fs.FileSystem, p: org.apache.hadoop.fs.Path): Boolean =
    f.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))

  /** Latest COMMITTED snapshot directory (max `v<N>` bearing `_SUCCESS`). */
  def latestDir(spark: SparkSession, tableDir: String): String = {
    val p = new org.apache.hadoop.fs.Path(tableDir)
    val f = fs(spark, tableDir)
    val versions = f.listStatus(p).toSeq
      .filter(s => s.getPath.getName.matches("v\\d+") && isCommitted(f, s.getPath))
      .map(_.getPath.getName.drop(1).toLong)
    require(versions.nonEmpty, s"no committed snapshot versions under $tableDir")
    s"$tableDir/v${versions.max}"
  }

  /** Drop all snapshot versions except the latest `keep`. */
  def prune(spark: SparkSession, tableDir: String, keep: Int = 2): Unit = {
    require(keep >= 1, "keep must be >= 1")
    val p = new org.apache.hadoop.fs.Path(tableDir)
    val f = fs(spark, tableDir)
    f.listStatus(p).toSeq
      .map(_.getPath)
      .filter(_.getName.matches("v\\d+"))
      .sortBy(_.getName.drop(1).toLong)
      .dropRight(keep)
      .foreach(f.delete(_, true))
  }

  /** Seeds `v0` with `base` (skipped when the table already has versions —
    * recovery path), then drains `updates` (AvailableNow) applying one
    * merge per micro-batch. Returns the number of batches applied.
    * Checkpoint lives inside the table dir by default (the IndexIngest
    * convention): one logical source per table, re-runs resume.
    */
  def ingest(
      spark: SparkSession,
      updates: DataFrame,
      base: DataFrame,
      tableDir: String,
      keyCol: String,
      seqCol: Option[String] = None,
      tombstoneCol: Option[String] = None,
      checkpointDir: Option[String] = None): Long = {
    val checkpoint = checkpointDir.getOrElse(s"$tableDir/_graft_checkpoint")
    val root = new org.apache.hadoop.fs.Path(tableDir)
    val f = fs(spark, tableDir)
    // commit detection keys on the _SUCCESS marker: a deployment with
    // marksuccessfuljobs=false would make every snapshot — including a
    // healthy v0 this writer just produced — invisible to isCommitted;
    // fail at init with the real cause instead of a misleading "no
    // committed snapshot versions" later (round-10 advice item)
    require(
      spark.sessionState.newHadoopConf().getBoolean(
        "mapreduce.fileoutputcommitter.marksuccessfuljobs", true),
      "MergeIngest requires mapreduce.fileoutputcommitter.marksuccessfuljobs=true " +
        "(snapshot commit detection keys on the _SUCCESS marker)")
    val hasVersions = f.exists(root) &&
      f.listStatus(root).exists(s =>
        s.getPath.getName.matches("v\\d+") && isCommitted(f, s.getPath))
    if (!hasVersions) base.write.mode("overwrite").parquet(s"$tableDir/v0")
    val batches = new java.util.concurrent.atomic.AtomicLong(0L)
    val query = updates.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          // read the newest COMMITTED version ≤ batchId — NOT latestDir: a
          // batch replayed after a crash-between-write-and-commit would
          // otherwise read the half-written v{batchId+1} it is about to
          // overwrite (empty batches may skip versions, hence ≤); the
          // _SUCCESS filter shields against a crash mid-write of any
          // earlier version too
          val readable = f.listStatus(root).toSeq
            .filter(s =>
              s.getPath.getName.matches("v\\d+") && isCommitted(f, s.getPath))
            .map(_.getPath.getName.drop(1).toLong)
            .filter(_ <= batchId)
          require(readable.nonEmpty, s"no snapshot version <= $batchId under $tableDir")
          val merged = graft.ops.Corpus.mergeUpsert(
            spark.read.parquet(s"$tableDir/v${readable.max}"), batch,
            keyCol, seqCol, tombstoneCol)
          // full materialization into the NEXT version before any reader
          // sees it; an overwrite of the same version on batch replay
          merged.write.mode("overwrite").parquet(s"$tableDir/v${batchId + 1}")
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
