package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, DataType, FloatType}

/** Minimal `private[sql]` bridge. Everything else in the engine lives in the
  * `graft` package; only the two pieces that structurally need `sql`-private
  * types are here: the Column<->Expression converters and the
  * `inputTypes` declaration (Seq[AbstractDataType] is private[sql]).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

/** Base for binary expressions over two `array<float>` columns; declares the
  * implicit-cast contract (f64 vectors coerce to f32, matching the reference:
  * `/root/reference/src/ivf/parquet.rs:287-291`).
  */
abstract class FloatVectorBinaryExpression
    extends BinaryExpression with ImplicitCastInputTypes with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = FloatType
  override def nullable: Boolean = true
}

/** Base for unary expressions over one `array<float>` column (same implicit
  * f64→f32 coercion as the binary variant).
  */
abstract class FloatVectorUnaryExpression
    extends UnaryExpression with ImplicitCastInputTypes with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def nullable: Boolean = true
}

/** Base for unary expressions over one `binary` column. */
abstract class BytesUnaryExpression
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def nullable: Boolean = true
}

/** Base for binary expressions over two `binary` columns. */
abstract class BytesBinaryExpression
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def nullable: Boolean = true
}
