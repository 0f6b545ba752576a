package graft.ice.transform

import java.math.{BigDecimal => JBigDecimal}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.ice.types._

/** MurmurHash3 x86_32 — the public algorithm by Austin Appleby, as
  * required by the Iceberg spec (Appendix B) with seed 0.
  * Reference impl: src/iceberg/util/murmurhash3_internal.cc.
  * NOTE: Spark's `hash()` uses seed 42, hence this spec-exact copy. */
object Murmur3 {
  def hashBytes(data: Array[Byte], seed: Int = 0): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    val len = data.length
    var h1 = seed
    val nblocks = len / 4
    var i = 0
    while (i < nblocks) {
      val base = i * 4
      var k1 = (data(base) & 0xff) |
        ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) |
        ((data(base + 3) & 0xff) << 24)
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1; h1 = Integer.rotateLeft(h1, 13); h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    var k1 = 0
    val tail = nblocks * 4
    (len & 3) match {
      case 3 =>
        k1 ^= (data(tail + 2) & 0xff) << 16
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 2 =>
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 1 =>
        k1 ^= data(tail) & 0xff
      case _ =>
    }
    if ((len & 3) != 0) {
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2; h1 ^= k1
    }
    h1 ^= len
    // fmix32
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }
}

/** Iceberg spec Appendix B bucket hashing
  * (reference: src/iceberg/util/bucket_util.h:31-58, bucket_util.cc). */
object BucketUtil {
  /** ints/longs/date-days/time-µs/timestamp-µs hash as 8-byte LE long. */
  def hashLong(v: Long): Int = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array()
    Murmur3.hashBytes(b)
  }
  def hashInt(v: Int): Int = hashLong(v.toLong)
  def hashString(s: String): Int = Murmur3.hashBytes(s.getBytes(StandardCharsets.UTF_8))
  def hashBytes(b: Array[Byte]): Int = Murmur3.hashBytes(b)
  /** decimal: minimal big-endian two's-complement of the unscaled value. */
  def hashDecimal(d: JBigDecimal): Int = Murmur3.hashBytes(d.unscaledValue.toByteArray)
  /** uuid: 16 bytes big-endian. */
  def hashUuid(u: java.util.UUID): Int = {
    val b = ByteBuffer.allocate(16)
      .putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits).array()
    Murmur3.hashBytes(b)
  }
}

/** UTF-8-safe / type-aware truncation
  * (reference: src/iceberg/util/truncate_util.h:41-72). */
object TruncateUtil {
  def truncateLong(w: Long, v: Long): Long = v - (((v % w) + w) % w)
  def truncateInt(w: Int, v: Int): Int = v - (((v % w) + w) % w)
  /** first W Unicode code points. */
  def truncateString(w: Int, s: String): String = {
    val n = s.codePointCount(0, s.length)
    if (n <= w) s else s.substring(0, s.offsetByCodePoints(0, w))
  }
  def truncateDecimal(w: Long, d: JBigDecimal): JBigDecimal = {
    val unscaled = d.unscaledValue
    val bw = java.math.BigInteger.valueOf(w)
    val mod = unscaled.mod(bw) // BigInteger.mod is always non-negative
    new JBigDecimal(unscaled.subtract(mod), d.scale)
  }
  def truncateBinary(w: Int, b: Array[Byte]): Array[Byte] =
    if (b.length <= w) b else java.util.Arrays.copyOf(b, w)

  /** Spark-internal-Decimal adapter for TruncateExpr codegen (called from
    * generated Java via the static forwarder). */
  def truncateSparkDecimal(w: Long, d: org.apache.spark.sql.types.Decimal,
      precision: Int, scale: Int): org.apache.spark.sql.types.Decimal =
    org.apache.spark.sql.types.Decimal(
      truncateDecimal(w, d.toJavaBigDecimal), precision, scale)
}

/** A partition transform (reference: src/iceberg/transform.h:38-189,
  * transform_function.cc). `apply` evaluates on driver-side JVM values
  * (Iceberg runtime repr: date=Int days, time/timestamp=Long µs);
  * `toColumn` produces the equivalent Spark Column for distributed
  * evaluation. All transforms return null for null input
  * (transform.h:198). */
sealed trait Transform {
  def name: String
  def resultType(source: IcePrimitive): IcePrimitive
  /** Driver-side evaluation; input/output in Iceberg runtime repr. */
  def apply(value: Any, sourceType: IcePrimitive): Any
  /** Spark Column for the transform over a column of `sourceType`. */
  def toColumn(input: Column, sourceType: IcePrimitive): Column
  /** Whether ordering of source values is preserved (needed for
    * inclusive-projection of range predicates). */
  def preservesOrder: Boolean = false
}

case object IdentityTransform extends Transform {
  val name = "identity"
  def resultType(source: IcePrimitive): IcePrimitive = source
  def apply(value: Any, sourceType: IcePrimitive): Any = value
  def toColumn(input: Column, sourceType: IcePrimitive): Column = input
  override def preservesOrder: Boolean = true
}

final case class BucketTransform(numBuckets: Int) extends Transform {
  val name = s"bucket[$numBuckets]"
  def resultType(source: IcePrimitive): IcePrimitive = IntT

  def hash(value: Any, sourceType: IcePrimitive): Int = sourceType match {
    case IntT | DateT => BucketUtil.hashInt(value.asInstanceOf[Int])
    case LongT | TimeT | TimestampT | TimestampTzT =>
      BucketUtil.hashLong(value.asInstanceOf[Long])
    case StringT => BucketUtil.hashString(value.asInstanceOf[String])
    case BinaryT | FixedT(_) => BucketUtil.hashBytes(value.asInstanceOf[Array[Byte]])
    case DecimalT(_, _) => BucketUtil.hashDecimal(value.asInstanceOf[JBigDecimal])
    case UuidT => value match {
      case u: java.util.UUID => BucketUtil.hashUuid(u)
      case s: String => BucketUtil.hashUuid(java.util.UUID.fromString(s))
    }
    case t => throw new IllegalArgumentException(s"bucket unsupported for $t")
  }

  def apply(value: Any, sourceType: IcePrimitive): Any =
    if (value == null) null
    else Integer.valueOf((hash(value, sourceType) & Int.MaxValue) % numBuckets)

  /** Codegen'd Catalyst expression (BucketExpr) over the canonical
    * pre-hash representation of each source type. */
  def toColumn(input: Column, sourceType: IcePrimitive): Column = {
    val n = numBuckets
    sourceType match {
      case IntT | LongT | TimeT => BucketExpr.column(input.cast("long"), n)
      case DateT => BucketExpr.column(datediff(input, to_date(lit("1970-01-01"))), n)
      case TimestampT | TimestampTzT =>
        BucketExpr.column(unix_micros(input.cast("timestamp")), n)
      case StringT | UuidT | BinaryT | FixedT(_) | DecimalT(_, _) =>
        BucketExpr.column(input, n)
      case t => throw new IllegalArgumentException(s"bucket unsupported for $t")
    }
  }
}

final case class TruncateTransform(width: Int) extends Transform {
  val name = s"truncate[$width]"
  def resultType(source: IcePrimitive): IcePrimitive = source
  override def preservesOrder: Boolean = true

  def apply(value: Any, sourceType: IcePrimitive): Any =
    if (value == null) null
    else sourceType match {
      case IntT => Integer.valueOf(TruncateUtil.truncateInt(width, value.asInstanceOf[Int]))
      case LongT => java.lang.Long.valueOf(TruncateUtil.truncateLong(width.toLong, value.asInstanceOf[Long]))
      case StringT => TruncateUtil.truncateString(width, value.asInstanceOf[String])
      case DecimalT(_, _) => TruncateUtil.truncateDecimal(width.toLong, value.asInstanceOf[JBigDecimal])
      case BinaryT | FixedT(_) => TruncateUtil.truncateBinary(width, value.asInstanceOf[Array[Byte]])
      case t => throw new IllegalArgumentException(s"truncate unsupported for $t")
    }

  def toColumn(input: Column, sourceType: IcePrimitive): Column = sourceType match {
    case IntT | LongT =>
      val w = lit(width.toLong)
      (input - (((input % w) + w) % w)).cast(SparkConv.toSparkType(sourceType))
    case StringT => substring(input, 1, width) // Spark substring counts code points
    case DecimalT(_, _) => TruncateExpr.column(input, width)
    case BinaryT | FixedT(_) => TruncateExpr.column(input, width)
    case t => throw new IllegalArgumentException(s"truncate unsupported for $t")
  }
}

/** Shared temporal helpers (reference: src/iceberg/util/temporal_util.cc). */
private object Temporal {
  val MicrosPerDay = 86400L * 1000000L
  val MicrosPerHour = 3600L * 1000000L
  def toLocalDate(daysSinceEpoch: Int): java.time.LocalDate =
    java.time.LocalDate.ofEpochDay(daysSinceEpoch.toLong)
  def microsToLocalDateTime(us: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)
}

sealed abstract class TemporalTransform(val name: String) extends Transform {
  override def preservesOrder: Boolean = true
  protected def ofDate(d: java.time.LocalDate): Int
  protected def supportsDate: Boolean = true

  def resultType(source: IcePrimitive): IcePrimitive =
    if (name == "day") DateT else IntT

  def apply(value: Any, sourceType: IcePrimitive): Any =
    if (value == null) null
    else {
      val ld: java.time.LocalDate = sourceType match {
        case DateT if supportsDate => Temporal.toLocalDate(value.asInstanceOf[Int])
        case TimestampT | TimestampTzT =>
          Temporal.microsToLocalDateTime(value.asInstanceOf[Long]).toLocalDate
        case t => throw new IllegalArgumentException(s"$name unsupported for $t")
      }
      Integer.valueOf(ofDate(ld))
    }
}

case object YearTransform extends TemporalTransform("year") {
  protected def ofDate(d: java.time.LocalDate): Int = d.getYear - 1970
  def toColumn(input: Column, sourceType: IcePrimitive): Column =
    (year(input) - lit(1970)).cast("int")
}

case object MonthTransform extends TemporalTransform("month") {
  protected def ofDate(d: java.time.LocalDate): Int =
    (d.getYear - 1970) * 12 + d.getMonthValue - 1
  def toColumn(input: Column, sourceType: IcePrimitive): Column =
    ((year(input) - lit(1970)) * lit(12) + month(input) - lit(1)).cast("int")
}

case object DayTransform extends TemporalTransform("day") {
  protected def ofDate(d: java.time.LocalDate): Int = d.toEpochDay.toInt
  def toColumn(input: Column, sourceType: IcePrimitive): Column =
    datediff(to_date(input), to_date(lit("1970-01-01"))).cast("int")
}

case object HourTransform extends TemporalTransform("hour") {
  override protected def supportsDate: Boolean = false
  protected def ofDate(d: java.time.LocalDate): Int =
    throw new IllegalArgumentException("hour unsupported for date")
  override def apply(value: Any, sourceType: IcePrimitive): Any =
    if (value == null) null
    else sourceType match {
      case TimestampT | TimestampTzT =>
        Integer.valueOf(Math.floorDiv(value.asInstanceOf[Long], Temporal.MicrosPerHour).toInt)
      case t => throw new IllegalArgumentException(s"hour unsupported for $t")
    }
  def toColumn(input: Column, sourceType: IcePrimitive): Column =
    floor(unix_micros(input.cast("timestamp")) / lit(Temporal.MicrosPerHour)).cast("int")
}

case object VoidTransform extends Transform {
  val name = "void"
  def resultType(source: IcePrimitive): IcePrimitive = source
  def apply(value: Any, sourceType: IcePrimitive): Any = null
  def toColumn(input: Column, sourceType: IcePrimitive): Column =
    lit(null).cast(SparkConv.toSparkType(sourceType))
}

object Transform {
  /** Parse spec strings: identity, bucket[16], truncate[4], year, month,
    * day, hour, void (reference: transform.cc TransformFromString). */
  def fromString(s: String): Transform = {
    val Bucket = """bucket\[(\d+)\]""".r
    val Trunc = """truncate\[(\d+)\]""".r
    s.trim.toLowerCase match {
      case "identity" => IdentityTransform
      case "year" | "years" => YearTransform
      case "month" | "months" => MonthTransform
      case "day" | "days" | "date" => DayTransform
      case "hour" | "hours" | "date_hour" => HourTransform
      case "void" => VoidTransform
      case Bucket(n) => BucketTransform(n.toInt)
      case Trunc(w) => TruncateTransform(w.toInt)
      case other => throw new IllegalArgumentException(s"unknown transform: $other")
    }
  }
}
