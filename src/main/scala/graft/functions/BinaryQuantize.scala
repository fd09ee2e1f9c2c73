package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.{BytesBinaryExpression, FloatVectorUnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 1-bit binary quantization (sign codes): bit i = 1 iff `x_i > 0`, packed
  * LSB-first into `ceil(dim/8)` bytes — a 64-dim f32 vector (256 B) becomes
  * 8 B, a 32× shrink (256× per element vs f32's 32 bits).
  *
  * This is the deepest tier of the engine's quantization ladder
  * (f32 → SQ8 4× → PQ 32×/codebook → BIN1 32× flat): the coarsest and
  * cheapest coarse-ranking key for two-phase search. Hamming distance
  * between sign codes is a monotone surrogate for angular distance
  * (E[hamming] ∝ θ/π for random hyperplane signs — here the hyperplanes
  * are the coordinate axes, the classic sign-sketch special case), so
  * binary coarse ranking suits cosine-shaped workloads; like the other
  * tiers, exact float re-rank of the `k·oversample` survivors restores
  * precision.
  *
  * Everything is integer-exact and engine-reproducible: the sign test and
  * the popcount have identical semantics in the JVM and SQL engines
  * (NaN → bit 0 EXPLICITLY — Java's `NaN > 0` is false but e.g. DuckDB
  * orders NaN above all values, so the cross-engine twin must special-case
  * it), which makes binary-tier results hash-gateable rather than
  * within-epsilon.
  */
object Bin1 {

  /** Packed code length in bytes for a `dim`-element vector. */
  def codeLen(dim: Int): Int = (dim + 7) >>> 3

  /** Sign-bit pack: bit i of byte i/8 (LSB-first) = 1 iff a(i) > 0.
    * NaN packs as 0 (see object doc); pad bits beyond dim are 0 on both
    * sides of any comparison, so they never contribute to Hamming.
    */
  def encode(a: Array[Float]): Array[Byte] = {
    val out = new Array[Byte](codeLen(a.length))
    var i = 0
    while (i < a.length) {
      // Java NaN > 0f is already false; the branch is the documented contract
      if (!java.lang.Float.isNaN(a(i)) && a(i) > 0f) {
        out(i >>> 3) = (out(i >>> 3) | (1 << (i & 7))).toByte
      }
      i += 1
    }
    out
  }

  /** Bits of a packed code as 0/1 ints, `dim` elements (inspection twin). */
  def bits(codes: Array[Byte], dim: Int): Array[Int] = {
    require(codes.length == codeLen(dim), s"code length ${codes.length} != ceil($dim/8)")
    val out = new Array[Int](dim)
    var i = 0
    while (i < dim) {
      out(i) = (codes(i >>> 3) >>> (i & 7)) & 1
      i += 1
    }
    out
  }

  /** Exact Hamming distance between two packed codes (caller checks
    * lengths): xor + popcount, 8 bytes per `Long.bitCount` step.
    */
  def hamming(a: Array[Byte], b: Array[Byte]): Long = {
    var sum = 0L
    var i = 0
    // bulk 8-byte strides
    while (i + 8 <= a.length) {
      var xa = 0L
      var xb = 0L
      var j = 0
      while (j < 8) {
        xa = (xa << 8) | (a(i + j) & 0xffL)
        xb = (xb << 8) | (b(i + j) & 0xffL)
        j += 1
      }
      sum += java.lang.Long.bitCount(xa ^ xb)
      i += 8
    }
    while (i < a.length) {
      sum += java.lang.Integer.bitCount((a(i) ^ b(i)) & 0xff)
      i += 1
    }
    sum
  }
}

/** `bin1_encode(vec)`: array<float> → packed sign-bit binary codes.
  * Null vector or null element yields NULL (engine-wide skip semantics).
  */
case class Bin1Encode(child: Expression) extends FloatVectorUnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bin1_encode"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      i += 1
    }
    Bin1.encode(a.toFloatArray())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      s"""
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = graft.functions.Bin1.encode($a.toFloatArray());
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `bin1_hamming(a, b)`: exact Hamming distance between two packed sign
  * codes — the binary tier's coarse ranking key. Length mismatch yields
  * NULL (skip semantics, like [[Sq8DistanceSq]]).
  */
case class Bin1Hamming(left: Expression, right: Expression) extends BytesBinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bin1_hamming"

  override def nullSafeEval(leftVal: Any, rightVal: Any): Any = {
    val a = leftVal.asInstanceOf[Array[Byte]]
    val b = rightVal.asInstanceOf[Array[Byte]]
    if (a.length != b.length) null else Bin1.hamming(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |if ($a.length != $b.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.Bin1.hamming($a, $b);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
