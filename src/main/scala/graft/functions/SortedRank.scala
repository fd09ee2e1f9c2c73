package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** `sorted_rank(v)`: the number of boundaries `<= v` in a sorted double
  * array — the equi-depth bucket rank behind [[graft.ops.Layout.writeZOrder]].
  *
  * The first formulation was `size(filter(typedLit(bounds), b => b <= v))`:
  * a higher-order function, which Spark evaluates INTERPRETED and which
  * materializes the filtered array — at 2^bits−1 = 255 boundaries that is
  * 255 interpreted predicate calls plus an array allocation PER ROW PER
  * LAYOUT COLUMN on a job whose whole point is to relayout a 100 TB table
  * (review r11; the same kernel-vs-HOF trade as winnowing/marker counts).
  * This runs an O(log n) upper-bound binary search inside whole-stage
  * codegen instead.
  *
  * Ordering matches Spark SQL's `<=` total order via `Double.compare`
  * with zeros normalized: NaN sorts above every value (rank =
  * bounds.length, same as the HOF form under Spark's NaN-greatest
  * semantics) and -0.0 ranks equal to 0.0 (Double.compare alone would
  * split them). A null input stays null (callers coalesce to their
  * null-rank policy).
  */
case class SortedRank(child: Expression, bounds: Array[Double])
    extends UnaryExpression {
  require(
    bounds.zip(bounds.drop(1)).forall { case (a, b) => java.lang.Double.compare(a, b) <= 0 },
    "bounds must be ascending")

  private lazy val normBounds: Array[Double] = bounds.map(SortedRank.norm)

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_rank"
  override def simpleString(maxFields: Int): String =
    s"sorted_rank(${child.simpleString(maxFields)}, n=${bounds.length})"

  override def nullSafeEval(input: Any): Any =
    SortedRank.rank(input.asInstanceOf[Double], normBounds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("sortedBounds", normBounds, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SortedRank.rank($v, $b);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SortedRank {
  /** -0.0 → 0.0 so Double.compare agrees with SQL's `-0.0 == 0.0`. */
  @inline def norm(v: Double): Double = if (v == 0.0d) 0.0d else v

  /** Upper-bound binary search: #elements `<= v` under Double.compare's
    * total order, zeros normalized (also called from generated code;
    * `bounds` must already be zero-normalized).
    */
  def rank(v0: Double, bounds: Array[Double]): Int = {
    val v = norm(v0)
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (java.lang.Double.compare(bounds(mid), v) <= 0) lo = mid + 1
      else hi = mid
    }
    lo
  }
}
