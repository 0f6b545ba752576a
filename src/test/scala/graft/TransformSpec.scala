package graft

import java.math.{BigDecimal => JBigDecimal}

import org.scalatest.funsuite.AnyFunSuite

import graft.ice.transform._
import graft.ice.types._

/** Spec vectors mirrored from the reference's transform_test.cc:286-610
  * and the Iceberg spec Appendix B. */
class TransformSpec extends AnyFunSuite {

  test("bucket[4] spec vectors (transform_test.cc BucketTransformTests)") {
    val b = BucketTransform(4)
    assert(b(34, IntT) == 3)
    assert(b(34L, LongT) == 3)
    assert(b(new JBigDecimal("14.20"), DecimalT(4, 2)) == 3)
    // date 2017-11-16 = 17486 days since epoch
    assert(java.time.LocalDate.of(2017, 11, 16).toEpochDay == 17486L)
    assert(b(17486, DateT) == 2)
    // time 22:31:08 = 81068000000 µs since midnight
    assert(b(81068000000L, TimeT) == 3)
    // timestamp 2017-11-16T22:31:08 µs
    val ts = java.time.LocalDateTime.of(2017, 11, 16, 22, 31, 8)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    assert(b(ts, TimestampT) == 3)
    // timestamptz 2017-11-16T14:31:08.000001-08:00
    val tstz = java.time.OffsetDateTime.parse("2017-11-16T14:31:08.000001-08:00")
      .toInstant
    val tstzUs = tstz.getEpochSecond * 1000000L + tstz.getNano / 1000L
    assert(b(tstzUs, TimestampTzT) == 2)
    assert(b("iceberg", StringT) == 1)
    assert(b(java.util.UUID.fromString("f79c3e09-677c-4bbd-a479-3f349cb785e7"), UuidT) == 0)
    assert(b(Array[Byte](0, 1, 2, 3), FixedT(4)) == 1)
    assert(b(Array[Byte](0, 1, 2, 3), BinaryT) == 1)
    assert(b(null, IntT) == null)
  }

  test("murmur3 bucket hash spec values (Iceberg spec Appendix B)") {
    assert(BucketUtil.hashLong(34L) == 2017239379)
    assert(BucketUtil.hashInt(34) == 2017239379)
    assert(BucketUtil.hashString("iceberg") == 1210000089)
    assert(BucketUtil.hashLong(17486L) == -653330422) // date 2017-11-16
    assert(BucketUtil.hashLong(81068000000L) == -662762989) // time 22:31:08
  }

  test("truncate spec vectors (transform_test.cc TruncateTransformTests)") {
    assert(TruncateTransform(5)(123456, IntT) == 123455)
    assert(TruncateTransform(10)(-1L, LongT) == -10L)
    assert(TruncateTransform(50)(new JBigDecimal("123.45"), DecimalT(5, 2))
      .asInstanceOf[JBigDecimal].compareTo(new JBigDecimal("123.00")) == 0)
    assert(TruncateTransform(5)("Hello, World!", StringT) == "Hello")
    assert(TruncateTransform(5)("😜🧐🤔🤪🥳😵‍💫😂", StringT)
      == "😜🧐🤔🤪🥳")
    assert(TruncateTransform(8)("a😜b🧐c🤔d🤪e🥳", StringT)
      == "a😜b🧐c🤔d🤪")
    assert(java.util.Arrays.equals(
      TruncateTransform(3)(Array[Byte](1, 2, 3, 4, 5), BinaryT).asInstanceOf[Array[Byte]],
      Array[Byte](1, 2, 3)))
    assert(TruncateTransform(5)(null, IntT) == null)
  }

  test("temporal transforms (transform_test.cc temporal vectors)") {
    val d20171116 = 17486
    assert(YearTransform(d20171116, DateT) == 47)
    assert(MonthTransform(d20171116, DateT) == 47 * 12 + 10)
    assert(DayTransform(d20171116, DateT) == 17486)
    val ts = java.time.LocalDateTime.of(2017, 11, 16, 22, 31, 8)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    assert(YearTransform(ts, TimestampT) == 47)
    assert(MonthTransform(ts, TimestampT) == 47 * 12 + 10)
    assert(DayTransform(ts, TimestampT) == 17486)
    assert(HourTransform(ts, TimestampT) == 17486 * 24 + 22)
    // negative (pre-epoch) timestamps floor correctly
    val pre = java.time.LocalDateTime.of(1969, 12, 31, 23, 0, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    assert(HourTransform(pre, TimestampT) == -1)
    assert(DayTransform(pre, TimestampT) == -1)
    assert(VoidTransform(123, IntT) == null)
  }

  test("transform string round-trip (transform.cc TransformFromString)") {
    assert(Transform.fromString("bucket[16]") == BucketTransform(16))
    assert(Transform.fromString("truncate[4]") == TruncateTransform(4))
    assert(Transform.fromString("identity") == IdentityTransform)
    assert(Transform.fromString("year") == YearTransform)
    assert(Transform.fromString("void") == VoidTransform)
    assert(BucketTransform(16).name == "bucket[16]")
  }

  test("literal serde round-trip (literal_test.cc / conversions.cc pattern)") {
    def rt(l: Literal): Unit = {
      val back = Literal.deserialize(l.tpe, l.serialize)
      (l.raw, back.raw) match {
        case (a: Array[Byte], b: Array[Byte]) => assert(java.util.Arrays.equals(a, b))
        case (a, b) => assert(a == b, s"type ${l.tpe}")
      }
    }
    rt(Literal.bool(true)); rt(Literal.bool(false))
    rt(Literal.int(34)); rt(Literal.int(-1))
    rt(Literal.long(Long.MaxValue)); rt(Literal.long(-34L))
    rt(Literal.float(1.5f)); rt(Literal.double(-3.75))
    rt(Literal.string("iceberg")); rt(Literal.string(""))
    rt(Literal.binary(Array[Byte](1, 2, 3)))
    rt(Literal.date(17486)); rt(Literal.timestampMicros(1510871468000000L))
    rt(Literal.decimal(new JBigDecimal("14.20"), 9))
    rt(Literal(LiteralValue.Value(java.util.UUID.randomUUID()), UuidT))
  }

  test("literal serde spec-exact bytes (Iceberg spec Appendix D)") {
    assert(Literal.bool(true).serialize.toSeq == Seq[Byte](1))
    assert(Literal.int(1).serialize.toSeq == Seq[Byte](1, 0, 0, 0)) // little-endian
    assert(Literal.long(1L).serialize.toSeq == Seq[Byte](1, 0, 0, 0, 0, 0, 0, 0))
    assert(Literal.string("AB").serialize.toSeq == Seq[Byte](65, 66))
    // decimal 14.20 unscaled 1420 = 0x058C big-endian
    assert(Literal.decimal(new JBigDecimal("14.20"), 4).serialize.toSeq ==
      Seq[Byte](0x05, 0x8c.toByte))
  }

  test("literal casts (literal.cc:94-260)") {
    assert(Literal.int(5).castTo(LongT).get.raw == 5L)
    assert(Literal.long(Long.MaxValue).castTo(IntT).get.value == LiteralValue.AboveMax)
    assert(Literal.long(Long.MinValue).castTo(IntT).get.value == LiteralValue.BelowMin)
    assert(Literal.float(1.5f).castTo(DoubleT).get.raw == 1.5)
    assert(Literal.string("2017-11-16").castTo(DateT).get.raw == 17486)
    assert(Literal.int(5).compareTo(Literal.int(7)) == Some(-1))
    assert(Literal.double(Double.NaN).compareTo(Literal.double(1.0)) == None)
  }
}

class SchemaSpec extends AnyFunSuite {
  private val schema = Schema(1, IndexedSeq(
    NestedField(1, "id", LongT, required = true),
    NestedField(2, "data", StringT, required = false),
    NestedField(3, "address", StructT(IndexedSeq(
      NestedField(4, "street", StringT, required = true),
      NestedField(5, "zip", IntT, required = false))), required = false),
    NestedField(6, "points", ListT(7, DoubleT, elementRequired = true), required = false),
    NestedField(8, "props", MapT(9, StringT, 10, StringT, valueRequired = false), required = false)))

  test("field lookup by id and dotted name (schema.h:62-75)") {
    assert(schema.findFieldById(1).get.name == "id")
    assert(schema.findFieldById(5).get.name == "zip")
    assert(schema.findFieldByName("address.street").get.id == 4)
    assert(schema.findFieldByName("points.element").get.id == 7)
    assert(schema.findFieldByName("props.value").get.id == 10)
    assert(schema.findFieldByName("ID", caseSensitive = false).get.id == 1)
    assert(schema.highestFieldId == 10)
  }

  test("select / project (schema.h:85,94)") {
    assert(schema.select(Seq("id", "data")).fields.map(_.id) == Seq(1, 2))
    assert(schema.project(Seq(2, 3)).fields.map(_.id) == Seq(2, 3))
  }

  test("Spark conversion carries field ids") {
    val st = schema.toSpark
    assert(st.fields(0).metadata.getLong("iceberg.id") == 1L)
    assert(st.fields(0).metadata.getLong("parquet.field.id") == 1L)
    assert(!st.fields(0).nullable && st.fields(1).nullable)
    val roundTrip = SparkConv.fromSpark(st)
    assert(roundTrip.fields.map(_.name) == schema.fields.map(_.name))
  }

  test("primitive type string round-trip (type.h typeString)") {
    for (t <- Seq(BooleanT, IntT, LongT, FloatT, DoubleT, DateT, TimeT,
        TimestampT, TimestampTzT, StringT, BinaryT, UuidT,
        DecimalT(9, 2), FixedT(16)))
      assert(IceType.fromPrimitiveString(t.typeString) == t)
  }
}
