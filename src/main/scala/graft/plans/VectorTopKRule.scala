package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{broadcast, col}
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.{ArrayDistance, ArraySquaredL2}
import graft.ivf.{IndexStore, ParquetFooterIndex}

/** SQL-transparent IVF acceleration: rewrites
  * `ORDER BY array_distance(col, literal-vector) ASC LIMIT k` over a single
  * indexed Parquet relation so the scan only reads IVF candidate rows.
  *
  * This is the Spark analog of the reference's
  * `VectorTopKPhysicalOptimizerRule` (`/root/reference/src/df_vector/
  * physical.rs:20-196`), re-expressed as a logical rewrite: instead of a
  * custom physical operator, the parquet leaf is replaced by a broadcast
  * semi-join against a probed (file, row ordinal) feed, and the original
  * Filter/Project chain plus Sort+Limit stay untouched above it. The feed
  * depends on what sits below the top-k: FILTER-FREE queries get the
  * winner-first two-phase feed (rank all candidates on selective
  * single-column reads, semi-join only the k winners — payload IO ∝ k);
  * queries with residual filters get the full candidate feed, because
  * post-filter semantics must see every candidate row before the top-k.
  * Catalyst then plans the Sort+Limit as `TakeOrderedAndProjectExec` (bounded
  * heap — the reference's exact re-rank) and pushes residual predicates over
  * candidate rows only (the reference's post-filter semantics,
  * `src/df_vector/exec.rs`/`tests.rs:151-241`).
  *
  * Guard matrix mirrors `physical.rs:134-177`: single sort expression,
  * ascending, `array_distance(col, literal)` in either argument order with
  * casts stripped, exactly one parquet relation beneath with only
  * Filter/Project in between, no OFFSET (a plan with offset has a different
  * shape and never matches), every scan file indexed for the sorted column.
  *
  * Results are ANN for `nprobe < nClusters` — identical to the reference's
  * contract; set `spark.graft.ivf.nprobe >= nClusters` for exact top-k.
  */
case class VectorTopKRule(spark: SparkSession) extends Rule[LogicalPlan] {

  import VectorTopKRule._

  private def conf(key: String, default: String): String =
    spark.conf.getOption(key).getOrElse(default)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf(EnabledKey, "true") != "true") return plan
    plan.transformDown {
      case limit @ Limit(IntegerLiteral(k), lchild) =>
        // column pruning may leave Projects between the limit and the sort
        val (projects, sortCandidate) = peelProjects(lchild)
        sortCandidate match {
          case sort @ Sort(Seq(order), true, child, _)
              if sort.getTagValue(RewrittenTag).isEmpty =>
            tryRewrite(k, order, child) match {
              case Some(newChild) =>
                val newSort = sort.copy(child = newChild)
                newSort.setTagValue(RewrittenTag, ())
                val rebuilt = projects.foldRight(newSort: LogicalPlan) {
                  (pr, acc) => pr.copy(child = acc)
                }
                limit match {
                  case gl @ GlobalLimit(_, ll @ LocalLimit(_, _)) =>
                    gl.copy(child = ll.copy(child = rebuilt))
                  case other => other
                }
              case None => limit
            }
          case _ => limit
        }
    }
  }

  private def peelProjects(p: LogicalPlan): (Seq[Project], LogicalPlan) = p match {
    case pr @ Project(_, c) =>
      val (ps, leaf) = peelProjects(c)
      (pr +: ps, leaf)
    case other => (Nil, other)
  }

  /** Strip Cast/TryCast wrappers (reference `strip_wrappers`,
    * physical.rs:216-229).
    */
  private def stripCast(e: Expression): Expression = e match {
    case Cast(c, _, _, _) => stripCast(c)
    case other => other
  }

  /** Extract (vector attribute, query literal) from a distance sort key,
    * accepting both argument orders (physical.rs:198-243).
    */
  private def extractDistanceArgs(e: Expression): Option[(Attribute, Array[Float])] = {
    def lit2vec(l: Expression): Option[Array[Float]] = stripCast(l) match {
      case Literal(data: ArrayData, ArrayType(FloatType, _)) =>
        Option(data).map(_.toFloatArray())
      case Literal(data: ArrayData, ArrayType(DoubleType, _)) =>
        Option(data).map(_.toDoubleArray().map(_.toFloat))
      case _ => None
    }
    def attr(a: Expression): Option[Attribute] = stripCast(a) match {
      case ar: Attribute => Some(ar)
      case _ => None
    }
    val args = stripCast(e) match {
      case ArrayDistance(l, r) => Some((l, r))
      case ArraySquaredL2(l, r) => Some((l, r))
      case _ => None
    }
    args.flatMap { case (l, r) =>
      (attr(l), lit2vec(r)) match {
        case (Some(a), Some(v)) => Some((a, v))
        case _ =>
          (attr(r), lit2vec(l)) match {
            case (Some(a), Some(v)) => Some((a, v))
            case _ => None
          }
      }
    }
  }

  /** Only Filter/Project may sit between the sort input and the scan
    * (the reference additionally allows its repartition node, which has no
    * logical analog here).
    */
  private def findSingleParquetLeaf(plan: LogicalPlan): Option[LogicalRelation] =
    plan match {
      case Filter(_, c) => findSingleParquetLeaf(c)
      case Project(_, c) => findSingleParquetLeaf(c)
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation
              if fs.fileFormat.getClass.getSimpleName.startsWith("Parquet") =>
            Some(lr)
          case _ => None
        }
      case _ => None
    }

  /** True when only row-preserving Projects sit between the sort input and
    * the scan — the precondition for the winner-first (two-phase) feed: a
    * Filter below the top-k must see full candidate rows, a Project never
    * drops rows.
    */
  private def filterFree(plan: LogicalPlan): Boolean = plan match {
    case Project(_, c) => filterFree(c)
    case _: LogicalRelation => true
    case _ => false
  }

  private def tryRewrite(
      k: Int, order: SortOrder, child: LogicalPlan): Option[LogicalPlan] = {
    if (order.direction != Ascending) return None
    for {
      (attr, query) <- extractDistanceArgs(order.child)
      lr <- findSingleParquetLeaf(child)
      // the sorted attribute must be a physical column of the scan
      column <- lr.output.find(_.exprId == attr.exprId).map(_.name)
      rewritten <- buildPrunedLeaf(lr, column, query, k, filterFree(child))
    } yield MeteredFetch(child.transformUp {
      case l: LogicalRelation if l.eq(lr) => rewritten
    })
  }

  /** Header-peek every file's index (cheap, driver-side) and graft
    * `scan -> semi-join(distributed candidate feed)` in place of the bare
    * relation, aliasing output back to the original attribute ids so the
    * untouched parent operators still resolve. Probing itself happens
    * executor-side inside `IvfCandidateScanExec`.
    */
  private def buildPrunedLeaf(
      lr: LogicalRelation,
      column: String,
      query: Array[Float],
      k: Int,
      filterFree: Boolean): Option[LogicalPlan] = {
    val fs = lr.relation.asInstanceOf[HadoopFsRelation]
    // canonical form matches `_metadata.file_path`, which the semi-join
    // compares against
    val files = fs.location.inputFiles.toSeq.map(IndexStore.canonicalPath).sorted
    if (files.isEmpty) return None
    val store = new IndexStore(conf(IndexDirKey, IndexStore.default.dir))
    val nprobe = conf(NprobeKey, "5").toInt
    val maxCandidates = conf(MaxCandidatesKey, "").toIntOption

    // any unindexed file, dim mismatch, or unreadable header: no rewrite
    files.foreach { file =>
      scala.util.Try(
        store.peek(file, column).orElse(ParquetFooterIndex.peek(file, column)))
        .toOption.flatten match {
        case Some((dim, _)) if dim == query.length => ()
        case _ => return None
      }
    }
    // winner-first only without a candidate cap: the cap's fairness quotas
    // need a distributed counts job, which must not run at OPTIMIZATION
    // time (a rule fires per action, and the rewrite can still bail)
    val candSide = if (filterFree && maxCandidates.isEmpty &&
        conf(TwoPhaseKey, "true") == "true") {
      // winner-first (two-phase): no Filter sits below the top-k, so the k
      // phase-1 winners ARE the result set — rank candidates on selective
      // single-column reads, then fetch payload for k rows only. The feed
      // is bounded by k, so broadcasting is always safe.
      val winners = graft.ivf.VectorTopK
        .searchByFiles(
          spark, files, column, query.toIndexedSeq,
          graft.ivf.VectorTopK.Options(nprobe), store)
        .orderBy(col("_dist").asc_nulls_last)
        .limit(k)
        .select(col("_file").as("__file"), col("_ri").as("__ri"))
      broadcast(winners)
    } else {
      // one full index load (first file) scaled by file count: O(1)
      // estimate for stats and broadcast-vs-shuffle selection
      val est = {
        val perFile = store.load(files.head, column)
          .orElse(ParquetFooterIndex.load(files.head, column))
          .map(_.candidateCount(query, nprobe)).getOrElse(0L)
        maxCandidates.fold(perFile * files.size)(c =>
          math.min(c.toLong, perFile * files.size))
      }
      val candDf = IvfCandidateScan.df(
        spark, column, query.toIndexedSeq, nprobe, maxCandidates,
        files, store.dir, est)
      val estBytes = est * IvfCandidateScan.estRowBytes(files)
      val threshold = spark.sessionState.conf.autoBroadcastJoinThreshold
      // threshold < 0 means the user DISABLED auto-broadcast — honor it
      // (the candidate feed can be huge at high nprobe / no cap); the 2x
      // safety factor covers the first-file-scaled estimate under-counting
      if (threshold >= 0 && estBytes * 2 <= threshold) broadcast(candDf) else candDf
    }
    val paths = fs.location.rootPaths.map(_.toString)
    val pruned = spark.read
      .schema(fs.dataSchema)
      .parquet(paths: _*)
      .withColumn("__file", col("_metadata.file_path"))
      .withColumn("__ri", col("_metadata.row_index"))
      .join(candSide, Seq("__file", "__ri"), "left_semi")
      .drop("__file", "__ri")
    // This rule runs in extraOptimizations, AFTER the main optimizer
    // batches — optimize the injected subtree explicitly so hint
    // elimination, pushdown, and pruning still apply inside it. (Our own
    // rule sees no Limit+Sort in the subtree, so this cannot recurse.)
    val prunedPlan = spark.sessionState.optimizer.execute(pruned.queryExecution.analyzed)
    // rebind the new scan's output to the original attribute ids
    val byName = prunedPlan.output.map(a => a.name -> a).toMap
    val aliases = lr.output.map { old =>
      byName.get(old.name) match {
        case Some(na) => Alias(na, old.name)(exprId = old.exprId)
        case None => return None
      }
    }
    Some(Project(aliases, prunedPlan))
  }
}

object VectorTopKRule {
  val EnabledKey = "spark.graft.ivf.enabled"
  val NprobeKey = "spark.graft.ivf.nprobe"
  val MaxCandidatesKey = "spark.graft.ivf.maxCandidates"
  val IndexDirKey = "spark.graft.ivf.indexDir"

  /** Filter-free queries use the winner-first two-phase feed (rank on
    * selective reads, fetch k payload rows); set false to force the
    * one-phase candidate semi-join everywhere.
    */
  val TwoPhaseKey = "spark.graft.ivf.twoPhase"

  /** Prevents re-matching the rewritten Sort on later rule iterations. */
  private[plans] val RewrittenTag = TreeNodeTag[Unit]("graft.ivf.rewritten")

  /** Runtime installation on an existing session (no extensions config
    * needed): appends to `spark.experimental.extraOptimizations`.
    */
  def install(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[VectorTopKRule])) {
      spark.experimental.extraOptimizations = existing :+ VectorTopKRule(spark)
    }
  }
}
