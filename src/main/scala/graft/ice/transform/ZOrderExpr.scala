package graft.ice.transform

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Z-order (Morton) curve primitives: per-type ORDER-PRESERVING 64-bit
  * codes, then an MSB-first bit interleave across columns. The output
  * byte array compares unsigned-lexicographically in exactly curve
  * order, so `repartitionByRange` + `sortWithinPartitions` on it
  * cluster rows into space-filling-curve tiles and every file's
  * per-column min/max bounds (C12 metrics) stay tight on ALL curve
  * columns at once — multi-dimensional file pruning from
  * one-dimensional clustering.
  *
  * Z-ordering is a layout heuristic: correctness never depends on the
  * encoding (pruning uses the real data bounds), so lossy encodes
  * (decimal → double, string → first 8 bytes) only shave clustering
  * quality, never results. */
object ZOrderUtil {
  /** Signed long → unsigned-comparable (flip the sign bit). */
  def encodeLong(v: Long): Long = v ^ Long.MinValue

  /** IEEE754 total-order trick: negatives get all bits flipped (so more
    * negative sorts lower), non-negatives get the sign bit flipped. */
  def encodeDouble(v: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(v)
    if (b < 0L) ~b else b ^ Long.MinValue
  }

  /** First 8 bytes big-endian, zero-padded — already unsigned order. */
  def encodeBytes(b: Array[Byte]): Long = {
    var r = 0L
    var i = 0
    while (i < 8) {
      r = (r << 8) | (if (i < b.length) b(i) & 0xffL else 0L)
      i += 1
    }
    r
  }

  /** MSB-first bit interleave of k 64-bit codes → 8k bytes: output bit
    * j*k+c is bit j (from the top) of column c. */
  def interleave(codes: Array[Long]): Array[Byte] = {
    val k = codes.length
    val out = new Array[Byte](8 * k)
    var bit = 0
    var j = 0
    while (j < 64) {
      var c = 0
      while (c < k) {
        if (((codes(c) >>> (63 - j)) & 1L) != 0L)
          out(bit >>> 3) = (out(bit >>> 3) | (0x80 >>> (bit & 7))).toByte
        bit += 1
        c += 1
      }
      j += 1
    }
    out
  }
}

/** `graft_zvalue(c1, c2, ...)`: the interleaved curve key as `binary`.
  * NULL encodes as the curve minimum (clusters with the smallest
  * values), so the expression itself is never null and stays inside
  * whole-stage codegen — it runs once per row over the full table
  * during a z-order rewrite, the hottest loop a maintenance job has. */
final case class ZValueExpr(children: Seq[Expression]) extends Expression {

  require(children.nonEmpty, "graft_zvalue needs at least one column")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_zvalue"

  private def supported(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
        TimestampType | TimestampNTZType | FloatType | DoubleType |
        BooleanType | StringType | BinaryType | _: DecimalType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = children.map(_.dataType).filterNot(supported)
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_zvalue does not support type(s) ${bad.mkString(", ")}")
  }

  private def encode(dt: DataType, v: Any): Long = dt match {
    case ByteType => ZOrderUtil.encodeLong(v.asInstanceOf[Byte].toLong)
    case ShortType => ZOrderUtil.encodeLong(v.asInstanceOf[Short].toLong)
    case IntegerType | DateType => ZOrderUtil.encodeLong(v.asInstanceOf[Int].toLong)
    case LongType | TimestampType | TimestampNTZType =>
      ZOrderUtil.encodeLong(v.asInstanceOf[Long])
    case FloatType => ZOrderUtil.encodeDouble(v.asInstanceOf[Float].toDouble)
    case DoubleType => ZOrderUtil.encodeDouble(v.asInstanceOf[Double])
    case BooleanType =>
      ZOrderUtil.encodeLong(if (v.asInstanceOf[Boolean]) 1L else 0L)
    case StringType => ZOrderUtil.encodeBytes(v.asInstanceOf[UTF8String].getBytes)
    case BinaryType => ZOrderUtil.encodeBytes(v.asInstanceOf[Array[Byte]])
    case _: DecimalType => ZOrderUtil.encodeDouble(v.asInstanceOf[Decimal].toDouble)
  }

  override def eval(input: InternalRow): Any = {
    val codes = new Array[Long](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      codes(i) = if (v == null) 0L else encode(children(i).dataType, v)
      i += 1
    }
    ZOrderUtil.interleave(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // static forwarders, not MODULE$ — see BucketExpr.doGenCode
    val util = ZOrderUtil.getClass.getName.stripSuffix("$")
    val encJava: (DataType, String) => String = {
      case (ByteType | ShortType | IntegerType | DateType, c) =>
        s"$util.encodeLong((long) $c)"
      case (LongType | TimestampType | TimestampNTZType, c) =>
        s"$util.encodeLong($c)"
      case (FloatType | DoubleType, c) => s"$util.encodeDouble((double) $c)"
      case (BooleanType, c) => s"$util.encodeLong($c ? 1L : 0L)"
      case (StringType, c) => s"$util.encodeBytes($c.getBytes())"
      case (BinaryType, c) => s"$util.encodeBytes($c)"
      case (_: DecimalType, c) => s"$util.encodeDouble($c.toDouble())"
      case (t, _) => throw new IllegalStateException(s"unsupported $t")
    }
    val codes = ctx.freshName("zcodes")
    val evals = children.map(_.genCode(ctx))
    val fills = evals.zip(children).zipWithIndex.map { case ((e, ch), i) =>
      s"""${e.code}
         |$codes[$i] = ${e.isNull} ? 0L : ${encJava(ch.dataType, e.value.toString)};""".stripMargin
    }.mkString("\n")
    val k = children.length
    ev.copy(
      code = code"""
long[] $codes = new long[$k];
$fills
byte[] ${ev.value} = $util.interleave($codes);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZValueExpr = copy(children = newChildren)
}

object ZValueExpr {
  import org.apache.spark.sql.GraftColumnBridge
  /** Column factory: the curve key over the given columns. */
  def zvalue(cols: Seq[Column]): Column =
    GraftColumnBridge.column(ZValueExpr(cols.map(GraftColumnBridge.expression)))
}
