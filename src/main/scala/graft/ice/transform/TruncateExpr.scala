package graft.ice.transform

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Codegen-friendly Catalyst expression for the decimal/binary Iceberg
  * truncate transform (reference: transform_function.cc truncate cases;
  * spec: decimal truncates the UNSCALED value toward negative infinity
  * by width W, binary keeps the first W bytes). int/long/string truncate
  * compose from built-in codegen'd functions in TruncateTransform
  * .toColumn; this expression closes the last two interpreted-UDF cases
  * so the whole transform family stays inside whole-stage codegen on the
  * write path (partition-value computation over every ingested row). */
final case class TruncateExpr(child: Expression, width: Int)
    extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "iceberg_truncate"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType | _: DecimalType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"iceberg_truncate supports binary and decimal, not $t")
    }

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case BinaryType => TruncateUtil.truncateBinary(width, v.asInstanceOf[Array[Byte]])
    case dt: DecimalType =>
      TruncateUtil.truncateSparkDecimal(width.toLong,
        v.asInstanceOf[Decimal], dt.precision, dt.scale)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // static forwarders, same Janino constraint as BucketExpr: the
    // `MODULE$` spelling silently breaks whole-stage codegen
    val util = TruncateUtil.getClass.getName.stripSuffix("$")
    child.dataType match {
      case BinaryType =>
        defineCodeGen(ctx, ev, c => s"$util.truncateBinary($width, $c)")
      case dt: DecimalType =>
        defineCodeGen(ctx, ev, c =>
          s"$util.truncateSparkDecimal(${width}L, $c, ${dt.precision}, ${dt.scale})")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): TruncateExpr =
    copy(child = newChild)
}

object TruncateExpr {
  def column(input: Column, width: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      TruncateExpr(org.apache.spark.sql.GraftColumnBridge.expression(input), width))
}
