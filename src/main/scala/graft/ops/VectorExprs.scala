package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Static vector kernels called from generated code (class-side
  * forwarders — Janino cannot reference `Obj.MODULE$`, see BucketExpr). */
object VectorUtil {
  /** Cosine similarity over the common prefix of two double arrays; one
    * fused pass computes dot and both norms (the HOF formulation walks
    * the arrays three times AND falls out of whole-stage codegen —
    * HigherOrderFunction is CodegenFallback). */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
}

/** Whole-stage-codegen cosine similarity over two `array<double>`
  * columns — the hot loop of every similarity operator (SURVEY §2.11).
  * At 100 TB of embeddings this loop IS the query; the generated code is
  * a single fused while-loop over unsafe array data, no boxing, no
  * interpreted HOF. Array elements are assumed non-null (embedding
  * vectors), matching the HOF formulation it replaces. */
final case class CosineExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_cosine"

  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine expects array<double>, got ${left.dataType} / ${right.dataType}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorUtil.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = VectorUtil.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$util.cosine($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineExpr =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  import org.apache.spark.sql.GraftColumnBridge._
  def cosine(a: Column, b: Column): Column =
    column(CosineExpr(expression(a), expression(b)))
}
