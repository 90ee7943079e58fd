package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Bit-exact double↔long reinterpret casts (IEEE-754 raw bits). Lets a
  * double payload ride the long `extra` slot of [[TopKByScore]] — e.g.
  * Slope One keeps each neighbor's deviation sum inside the top-K
  * aggregate instead of joining it back with a second scan of the
  * mirrored pair table. Lossless round-trip by definition.
  */
case class DoubleBits(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"double_bits expects double, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    java.lang.Double.doubleToRawLongBits(v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"java.lang.Double.doubleToRawLongBits($x)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "double_bits"
}

case class BitsDouble(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bits_double expects bigint, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    java.lang.Double.longBitsToDouble(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"java.lang.Double.longBitsToDouble($x)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "bits_double"
}

object BitCast {
  def doubleBits(c: Column): Column =
    GraftSqlBridge.column(DoubleBits(GraftSqlBridge.expression(c)))
  def bitsDouble(c: Column): Column =
    GraftSqlBridge.column(BitsDouble(GraftSqlBridge.expression(c)))
}
