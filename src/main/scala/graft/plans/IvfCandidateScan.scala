package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.LeafNode
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom plan node for IVF candidate generation — the Spark analog of the
  * reference's `VectorIndexScanExec` (`/root/reference/src/df_vector/
  * index_exec.rs`): emits one (file path, row ordinal) row per candidate and
  * surfaces the reference's metrics (`files_scanned`, `candidate_rows`,
  * `index_exec.rs:197-220`) as SQLMetrics visible in EXPLAIN/the Spark UI.
  * The probe itself already happened on the driver (indexes are small);
  * this node makes the candidate feed a first-class, metered plan citizen
  * instead of an anonymous local relation.
  */
final case class IvfCandidateScan(
    output: Seq[Attribute],
    column: String,
    queryDim: Int,
    nprobe: Int,
    perFile: Seq[(String, Array[Int])]) extends LeafNode {
  override def computeStats(): org.apache.spark.sql.catalyst.plans.logical.Statistics =
    org.apache.spark.sql.catalyst.plans.logical.Statistics(
      sizeInBytes = BigInt(perFile.map(_._2.length.toLong).sum) * 64 + 128,
      rowCount = Some(BigInt(perFile.map(_._2.length.toLong).sum)))
  override def simpleString(maxFields: Int): String =
    s"IvfCandidateScan [column=$column, dim=$queryDim, nprobe=$nprobe, " +
      s"files=${perFile.size}, candidates=${perFile.map(_._2.length).sum}]"
}

object IvfCandidateScan {
  def attrs: Seq[Attribute] = Seq(
    AttributeReference("__file", StringType, nullable = false)(),
    AttributeReference("__ri", LongType, nullable = false)())

  /** DataFrame over the custom node (requires [[GraftStrategy]] installed). */
  def df(
      spark: SparkSession,
      column: String,
      queryDim: Int,
      nprobe: Int,
      perFile: Seq[(String, Array[Int])]): DataFrame =
    Bridge.ofRows(spark, IvfCandidateScan(attrs, column, queryDim, nprobe, perFile))
}

final case class IvfCandidateScanExec(
    output: Seq[Attribute],
    column: String,
    queryDim: Int,
    nprobe: Int,
    perFile: Seq[(String, Array[Int])]) extends LeafExecNode {

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "filesScanned" -> SQLMetrics.createMetric(sparkContext, "files scanned"),
    "candidateRows" -> SQLMetrics.createMetric(sparkContext, "candidate rows"))

  override def simpleString(maxFields: Int): String =
    s"IvfCandidateScanExec [column=$column, dim=$queryDim, nprobe=$nprobe]"

  protected override def doExecute(): RDD[InternalRow] = {
    val filesScanned = longMetric("filesScanned")
    val candidateRows = longMetric("candidateRows")
    filesScanned.add(perFile.size.toLong)
    val proj = UnsafeProjection.create(output.map(_.dataType).toArray)
    val rows = perFile.iterator.flatMap { case (file, rids) =>
      val f = UTF8String.fromString(file)
      rids.iterator.map { r =>
        candidateRows.add(1L)
        proj(InternalRow(f, r.toLong)).copy()
      }
    }.toArray[InternalRow]
    sparkContext.parallelize(rows.toIndexedSeq, 1)
  }
}

/** Plans [[IvfCandidateScan]]; injected via `Graft.install` /
  * `GraftExtensions` (the reference registers its exec through its session
  * builder the same way, `src/df_vector/session.rs`).
  */
object GraftStrategy extends SparkStrategy {
  override def apply(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[SparkPlan] =
    plan match {
      case IvfCandidateScan(out, col, dim, nprobe, perFile) =>
        IvfCandidateScanExec(out, col, dim, nprobe, perFile) :: Nil
      case _ => Nil
    }
}
