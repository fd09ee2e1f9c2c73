package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** `nearest_centroid(vec)`: index of the nearest centroid (squared L2) in a
  * flat row-major k×dim centroid matrix — the map-side cell-assignment step
  * of IVF bucketing (reference assignment loop:
  * `/root/reference/src/ivf/index.rs:244-257`), as a codegen'd expression so
  * bucketed similarity joins stay inside whole-stage codegen (no UDF boxing).
  *
  * The centroid matrix rides along as a reference object in the serialized
  * expression; Spark broadcasts task binaries per stage, so executors receive
  * it once per stage, like an explicit broadcast variable.
  *
  * Null vector, null element, or length != dim yields NULL (the engine-wide
  * skip-don't-error vector semantics).
  */
case class NearestCentroid(child: Expression, centroids: Array[Float], dim: Int)
    extends UnaryExpression {
  require(dim > 0, "dim must be > 0")
  require(
    centroids.nonEmpty && centroids.length % dim == 0,
    s"centroid matrix length ${centroids.length} is not a multiple of dim $dim")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"
  override def simpleString(maxFields: Int): String =
    s"nearest_centroid(${child.simpleString(maxFields)}, k=${centroids.length / dim}, dim=$dim)"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != dim) return null
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i)) return null
      i += 1
    }
    VectorKernels.nearestCentroid(a.toFloatArray(), centroids, dim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "float[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = graft.functions.VectorKernels.nearestCentroid(
         |      $a.toFloatArray(), $cents, $dim);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `nearest_centroids(vec, p)`: indices of the `p` nearest centroids,
  * ascending by squared L2 — the multi-probe twin of [[NearestCentroid]]
  * (probing several cells per vector raises bucketed-join recall at the cost
  * of p× candidate fan-out; the same trade the IVF search path makes with
  * `nprobe`).
  */
case class NearestCentroids(child: Expression, centroids: Array[Float], dim: Int, p: Int)
    extends UnaryExpression {
  require(dim > 0, "dim must be > 0")
  require(p > 0, "p must be > 0")
  require(
    centroids.nonEmpty && centroids.length % dim == 0,
    s"centroid matrix length ${centroids.length} is not a multiple of dim $dim")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroids"
  override def simpleString(maxFields: Int): String =
    s"nearest_centroids(${child.simpleString(maxFields)}, " +
      s"k=${centroids.length / dim}, dim=$dim, p=$p)"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != dim) return null
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i)) return null
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VectorKernels.nearestCentroids(a.toFloatArray(), centroids, dim, p))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "float[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |      graft.functions.VectorKernels.nearestCentroids(
         |        $a.toFloatArray(), $cents, $dim, $p));
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
