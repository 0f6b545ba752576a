package graft.ice.meta

import java.math.{BigDecimal => JBigDecimal}
import java.time.{Instant, LocalDate, LocalDateTime, LocalTime, ZoneOffset}
import java.time.format.DateTimeFormatter
import java.time.temporal.ChronoUnit

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode

import graft.ice.types._

/** JSON single-value serialization (Iceberg spec Appendix D) — the wire
  * form of schema default values (`initial-default` / `write-default`).
  * The reference declares the field-name constants
  * (json_internal.cc:78-79) but never implements the serde; this is the
  * full spec mapping over the runtime value conventions documented on
  * [[graft.ice.types.Literal]] (Int days for date, Long micros for
  * time/timestamp, JBigDecimal for decimal, Array[Byte] for
  * binary/fixed, java.util.UUID for uuid; structs as IndexedSeq[Any]
  * aligned to the struct's field order, lists as Seq[Any], maps as
  * Seq[(Any, Any)] to allow non-hashable keys). */
object SingleValueJson {
  private val mapper = MetaJson.mapper
  private val timeFmt = DateTimeFormatter.ofPattern("HH:mm:ss.SSSSSS")
  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")

  def toJson(t: IceType, v: Any): JsonNode = {
    val nf = mapper.getNodeFactory
    require(v != null, "single-value JSON cannot encode null (omit the key)")
    (t, v) match {
      case (BooleanT, b: Boolean) => nf.booleanNode(b)
      case (IntT, i: Int) => nf.numberNode(i)
      case (LongT, l: Long) => nf.numberNode(l)
      case (FloatT, f: Float) => nf.numberNode(f)
      case (DoubleT, d: Double) => nf.numberNode(d)
      case (DecimalT(_, s), d: JBigDecimal) =>
        nf.textNode(d.setScale(s).toPlainString)
      case (DateT, days: Int) =>
        nf.textNode(LocalDate.ofEpochDay(days.toLong).toString)
      case (TimeT, micros: Long) =>
        nf.textNode(timeFmt.format(LocalTime.ofNanoOfDay(micros * 1000L)))
      case (TimestampT, micros: Long) =>
        nf.textNode(tsFmt.format(microsToLdt(micros)))
      case (TimestampTzT, micros: Long) =>
        nf.textNode(tsFmt.format(microsToLdt(micros)) + "+00:00")
      case (StringT, s: String) => nf.textNode(s)
      case (UuidT, u: java.util.UUID) => nf.textNode(u.toString)
      case (BinaryT | FixedT(_), b: Array[Byte]) =>
        nf.textNode(b.map(x => f"${x & 0xff}%02X").mkString)
      case (StructT(fields), vs: IndexedSeq[Any @unchecked]) =>
        require(vs.length == fields.length,
          s"struct default arity ${vs.length} != ${fields.length}")
        val o = mapper.createObjectNode()
        fields.zip(vs).foreach { case (f, fv) =>
          if (fv != null) o.set[JsonNode](f.id.toString, toJson(f.fieldType, fv))
          else o.putNull(f.id.toString)
        }
        o
      case (ListT(_, et, _), vs: Seq[Any @unchecked]) =>
        val a = mapper.createArrayNode()
        vs.foreach(e => if (e == null) a.addNull() else a.add(toJson(et, e)))
        a
      case (MapT(_, kt, _, vt, _), kvs: Seq[(Any, Any) @unchecked]) =>
        val o = mapper.createObjectNode()
        val ks = o.putArray("keys")
        val vsArr = o.putArray("values")
        kvs.foreach { case (k, mv) =>
          ks.add(toJson(kt, k))
          if (mv == null) vsArr.addNull() else vsArr.add(toJson(vt, mv))
        }
        o
      case _ => throw new IllegalArgumentException(
        s"cannot serialize ${v.getClass.getName} as single-value $t")
    }
  }

  def fromJson(t: IceType, n: JsonNode): Any = t match {
    case BooleanT => n.asBoolean
    case IntT => n.asInt
    case LongT => n.asLong
    case FloatT => n.floatValue
    case DoubleT => n.doubleValue
    case DecimalT(_, s) => new JBigDecimal(n.asText).setScale(s)
    case DateT => LocalDate.parse(n.asText).toEpochDay.toInt
    case TimeT => LocalTime.parse(n.asText).toNanoOfDay / 1000L
    case TimestampT =>
      val ldt = LocalDateTime.parse(n.asText)
      ldt.toEpochSecond(ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
    case TimestampTzT =>
      val odt = java.time.OffsetDateTime.parse(n.asText)
      odt.toEpochSecond * 1000000L + odt.getNano / 1000L
    case StringT => n.asText
    case UuidT => java.util.UUID.fromString(n.asText)
    case BinaryT | FixedT(_) =>
      n.asText.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    case StructT(fields) =>
      fields.map { f =>
        val fn = n.get(f.id.toString)
        if (fn == null || fn.isNull) null else fromJson(f.fieldType, fn)
      }
    case ListT(_, et, _) =>
      n.elements.asScala.map(e => if (e.isNull) null else fromJson(et, e)).toSeq
    case MapT(_, kt, _, vt, _) =>
      val ks = n.get("keys").elements.asScala.toSeq
      val vs = n.get("values").elements.asScala.toSeq
      ks.zip(vs).map { case (k, v) =>
        fromJson(kt, k) -> (if (v.isNull) null else fromJson(vt, v))
      }
  }

  /** The Spark-external value for `functions.lit` that round-trips
    * through [[graft.ice.types.SparkConv.toSparkType]]'s mapping —
    * what scans inject for files written before a defaulted column
    * existed. Primitive types only (nested defaults are serde-complete
    * but not applied by scans). */
  def toSparkValue(t: IcePrimitive, v: Any): Any = (t, v) match {
    case (DateT, days: Int) => LocalDate.ofEpochDay(days.toLong)
    case (TimestampT, micros: Long) => microsToLdt(micros)
    case (TimestampTzT, micros: Long) =>
      Instant.EPOCH.plus(micros, ChronoUnit.MICROS)
    case (UuidT, u: java.util.UUID) => u.toString
    case _ => v // boolean/int/long/float/double/string/decimal/binary/time pass through
  }

  private def microsToLdt(micros: Long): LocalDateTime = {
    val sec = Math.floorDiv(micros, 1000000L)
    val nano = Math.floorMod(micros, 1000000L) * 1000L
    LocalDateTime.ofEpochSecond(sec, nano.toInt, ZoneOffset.UTC)
  }
}
