package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.{BytesBinaryExpression, BytesUnaryExpression, FloatVectorUnaryExpression}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, FloatType, IntegerType, LongType}

/** Int8 scalar quantization (SQ8) kernels: a fixed symmetric [-1, 1] grid,
  * code = floor(clamp(x)·127 + 0.5), reconstruction = code / 127.
  *
  * This is the storage/IO scale lever for embedding columns: a 64-dim f32
  * vector (256 B) becomes a 64 B binary payload — at 100 TB the dominant
  * column shrinks 4×, and coarse distance ranking runs directly on the codes
  * without decoding. The fixed grid (vs per-vector min/max) keeps decode
  * stateless and the arithmetic integer-exact cross-engine: `x` widens to
  * f64 exactly, `x·127` is exact in f64 (24+7 significant bits), and
  * `floor(v + 0.5)` has identical semantics in the JVM and SQL engines —
  * codes are bit-reproducible everywhere, so quantized results can be
  * oracle-gated exactly rather than within-epsilon.
  *
  * Code-space squared L2 is order-equivalent to squared L2 on reconstructed
  * vectors (decode is a positive linear map) and is exact 64-bit integer
  * arithmetic — a deterministic coarse ranking key for two-phase search.
  */
object Sq8 {

  /** Quantize one float to an int8 code in [-127, 127]. NaN maps to code 0
    * EXPLICITLY (it fell there implicitly before — NaN comparisons are false
    * and `NaN.toByte == 0` — but SQL engines order NaN above all values, so
    * the cross-engine twin must special-case it the same way; see the
    * `isnan` branch in the DuckDB kernel in `Queries.duckSq8`).
    */
  def code(x: Float): Byte = {
    if (java.lang.Float.isNaN(x)) return 0
    var v = x.toDouble
    if (v > 1.0) v = 1.0
    if (v < -1.0) v = -1.0
    math.floor(v * 127.0 + 0.5).toByte
  }

  def encode(a: Array[Float]): Array[Byte] = {
    val out = new Array[Byte](a.length)
    var i = 0
    while (i < a.length) { out(i) = code(a(i)); i += 1 }
    out
  }

  def decode(codes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](codes.length)
    var i = 0
    while (i < codes.length) { out(i) = codes(i) / 127.0f; i += 1 }
    out
  }

  def codesAsInts(codes: Array[Byte]): Array[Int] = {
    val out = new Array[Int](codes.length)
    var i = 0
    while (i < codes.length) { out(i) = codes(i).toInt; i += 1 }
    out
  }

  /** Integer squared L2 between two code vectors (caller checks lengths). */
  def distanceSq(a: Array[Byte], b: Array[Byte]): Long = {
    var sum = 0L
    var i = 0
    while (i < a.length) {
      val d = (a(i) - b(i)).toLong
      sum += d * d
      i += 1
    }
    sum
  }

  /** Approximate angular distance (1 − cos) between two code vectors —
    * exact integer dot/norms on the grid points, one sqrt at the end. A
    * COARSE ranking key only (the quantized tier re-ranks survivors with
    * exact float cosine); zero-norm codes rank last (2.0, the angular
    * maximum), matching the float kernel's zero-vector convention.
    */
  def angularDist(a: Array[Byte], b: Array[Byte]): Double = {
    var dot = 0L
    var na = 0L
    var nb = 0L
    var i = 0
    while (i < a.length) {
      val x = a(i).toLong
      val y = b(i).toLong
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0L || nb == 0L) 2.0
    else 1.0 - dot.toDouble / math.sqrt(na.toDouble * nb.toDouble)
  }
}

/** `sq8_encode(vec)`: array<float> → 1-byte-per-element binary codes.
  * Null vector or null element yields NULL (engine-wide skip semantics).
  */
case class Sq8Encode(child: Expression) extends FloatVectorUnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "sq8_encode"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      i += 1
    }
    Sq8.encode(a.toFloatArray())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      s"""
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = graft.functions.Sq8.encode($a.toFloatArray());
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `sq8_decode(codes)`: binary codes → reconstructed array<float>. */
case class Sq8Decode(child: Expression) extends BytesUnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "sq8_decode"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(Sq8.decode(input.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.functions.Sq8.decode($a))")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `sq8_codes(codes)`: binary codes → array<int> (signed code values), for
  * SQL-composable inspection/aggregation of the quantized representation.
  */
case class Sq8Codes(child: Expression) extends BytesUnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "sq8_codes"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(Sq8.codesAsInts(input.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.functions.Sq8.codesAsInts($a))")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `sq8_distance_sq(a, b)`: exact integer squared L2 between two SQ8 code
  * vectors — the coarse ranking key of two-phase compressed search. Length
  * mismatch yields NULL (skip semantics, like [[ArrayDistance]]).
  */
case class Sq8DistanceSq(left: Expression, right: Expression) extends BytesBinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sq8_distance_sq"

  override def nullSafeEval(leftVal: Any, rightVal: Any): Any = {
    val a = leftVal.asInstanceOf[Array[Byte]]
    val b = rightVal.asInstanceOf[Array[Byte]]
    if (a.length != b.length) null else Sq8.distanceSq(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |if ($a.length != $b.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.Sq8.distanceSq($a, $b);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
