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

  /** Nearest centroid by squared euclidean distance; ties resolve to the
    * LOWEST index (strict less-than scan in ascending order — same as
    * the aggregate-over-sequence formulation it replaces). */
  def nearestCell(v: ArrayData, cents: Array[Array[Double]]): Int = {
    var best = -1
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val n = math.min(v.numElements(), cent.length)
      var d = 0.0
      var i = 0
      while (i < n) { val t = v.getDouble(i) - cent(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Random-hyperplane LSH signature, one traversal of the vector.
    * Bit-exact with the Column formulation it replaces:
    * `xxhash64(lit(plane), dim)` chains to
    * `XXH64.hashInt(dim, XXH64.hashInt(plane, 42))`, and `pmod(h,2)==0`
    * is `(h & 1) == 0`. `seeds(p)` carries the per-plane outer hash. */
  def signature(v: ArrayData, seeds: Array[Long]): Long = {
    val n = v.numElements()
    val nPlanes = seeds.length
    val proj = new Array[Double](nPlanes)
    var i = 0
    while (i < n) {
      val x = v.getDouble(i)
      var p = 0
      while (p < nPlanes) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(i, seeds(p))
        proj(p) += (if ((h & 1L) == 0L) x else -x)
        p += 1
      }
      i += 1
    }
    var bits = 0L
    var p = 0
    while (p < nPlanes) { if (proj(p) >= 0) bits |= 1L << p; p += 1 }
    bits
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

/** Whole-stage-codegen hyperplane-LSH signature over an `array<double>`
  * column — the corpus-side hot loop of the bucketed ANN path. One
  * traversal computes all `nPlanes` projections; the HOF formulation is
  * CodegenFallback and walks the vector once PER PLANE. */
final case class SignatureExpr(child: Expression, nPlanes: Int, table: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(nPlanes >= 1 && nPlanes <= 63, s"nPlanes out of range: $nPlanes")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_lsh_signature"

  // per-plane outer hash, fixed at plan time (plane ids are literals)
  private lazy val seeds: Array[Long] = Array.tabulate(nPlanes)(p =>
    org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(table * 10007 + p, 42L))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_signature expects array<double>, got $t")
  }

  override protected def nullSafeEval(v: Any): Any =
    VectorUtil.signature(v.asInstanceOf[ArrayData], seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = VectorUtil.getClass.getName.stripSuffix("$")
    val seedsRef = ctx.addReferenceObj("sigSeeds", seeds, "long[]")
    defineCodeGen(ctx, ev, c => s"$util.signature($c, $seedsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): SignatureExpr =
    copy(child = newChild)
}

/** Whole-stage-codegen IVF cell assignment over an `array<double>`
  * column — the corpus-side hot loop of the inverted-file ANN path
  * (O(nClusters x dim) per row). Centroids travel as a plan-time
  * reference object, not per-row data. */
final case class NearestCellExpr(child: Expression, cents: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_nearest_cell"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_cell expects array<double>, got $t")
  }

  override protected def nullSafeEval(v: Any): Any =
    VectorUtil.nearestCell(v.asInstanceOf[ArrayData], cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = VectorUtil.getClass.getName.stripSuffix("$")
    val centsRef = ctx.addReferenceObj("ivfCents", cents, "double[][]")
    defineCodeGen(ctx, ev, c => s"$util.nearestCell($c, $centsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellExpr =
    copy(child = newChild)

  // Array-typed case-class fields break default equals/hash — compare by
  // content so plan canonicalization stays sane
  override def equals(other: Any): Boolean = other match {
    case NearestCellExpr(c, cs) =>
      c == child && cs.length == cents.length &&
        cs.zip(cents).forall { case (a, b) => java.util.Arrays.equals(a, b) }
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + cents.map(java.util.Arrays.hashCode).toSeq.hashCode()
}

object VectorExprs {
  import org.apache.spark.sql.GraftColumnBridge._
  def cosine(a: Column, b: Column): Column =
    column(CosineExpr(expression(a), expression(b)))
  def signature(vec: Column, nPlanes: Int, table: Int = 0): Column =
    column(SignatureExpr(expression(vec), nPlanes, table))
  def nearestCell(vec: Column, cents: Array[Array[Double]]): Column =
    column(NearestCellExpr(expression(vec), cents))
}
