package graft.ice.transform

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen-friendly Catalyst expression for the Iceberg bucket transform
  * (SURVEY §7.4: "bucket: UDF first, optional Expression with doGenCode
  * later" — this is the later). Stays inside whole-stage codegen by
  * emitting a static call per input type; the UDF path it replaces broke
  * codegen and boxed every row.
  *
  * Accepted child types (the canonical pre-hash representations):
  * int (date-days), long (long/time/timestamp-µs), string, binary,
  * decimal. */
final case class BucketExpr(child: Expression, numBuckets: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"iceberg_bucket"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case IntegerType | LongType | StringType | BinaryType | _: DecimalType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"iceberg_bucket does not support type $t")
    }

  override protected def nullSafeEval(v: Any): Any = {
    val h = child.dataType match {
      case IntegerType => BucketUtil.hashInt(v.asInstanceOf[Int])
      case LongType => BucketUtil.hashLong(v.asInstanceOf[Long])
      case StringType => BucketUtil.hashBytes(v.asInstanceOf[UTF8String].getBytes)
      case BinaryType => BucketUtil.hashBytes(v.asInstanceOf[Array[Byte]])
      case _: DecimalType =>
        BucketUtil.hashDecimal(v.asInstanceOf[Decimal].toJavaBigDecimal)
    }
    (h & Int.MaxValue) % numBuckets
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // call the object's STATIC FORWARDERS (class BucketUtil) — Janino
    // rejects the `BucketUtil.MODULE$` spelling ("neither a method, a
    // field, nor a member class") and Spark silently falls back to
    // interpreted execution for the whole stage
    val util = BucketUtil.getClass.getName.stripSuffix("$")
    val hashCall: String => String = child.dataType match {
      case IntegerType => c => s"$util.hashInt($c)"
      case LongType => c => s"$util.hashLong($c)"
      case StringType => c => s"$util.hashBytes($c.getBytes())"
      case BinaryType => c => s"$util.hashBytes($c)"
      case _: DecimalType => c => s"$util.hashDecimal($c.toJavaBigDecimal())"
    }
    defineCodeGen(ctx, ev, c =>
      s"((${hashCall(c)} & Integer.MAX_VALUE) % $numBuckets)")
  }

  override protected def withNewChildInternal(newChild: Expression): BucketExpr =
    copy(child = newChild)
}

object BucketExpr {
  /** Column factory over the canonical pre-hash representation. */
  def column(input: Column, numBuckets: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      BucketExpr(org.apache.spark.sql.GraftColumnBridge.expression(input), numBuckets))
}
