package graft.ice.types

import org.apache.spark.sql.types._

/** Iceberg type system (reference: src/iceberg/type.h:64-535).
  *
  * Every nested field carries a stable int32 field ID
  * (schema_field.h:38-88) — by-ID resolution drives schema evolution,
  * projection and name mapping. Spark `StructField` metadata carries the
  * ID under both `"iceberg.id"` and `"parquet.field.id"` (the latter is
  * honored by Spark's parquet writer so data files embed field IDs).
  */
sealed trait IceType {
  def isPrimitive: Boolean = this.isInstanceOf[IcePrimitive]
  /** Spec JSON / display string, e.g. "long", "decimal(9, 2)". */
  def typeString: String
}

sealed trait IcePrimitive extends IceType

case object BooleanT extends IcePrimitive { val typeString = "boolean" }
case object IntT extends IcePrimitive { val typeString = "int" }
case object LongT extends IcePrimitive { val typeString = "long" }
case object FloatT extends IcePrimitive { val typeString = "float" }
case object DoubleT extends IcePrimitive { val typeString = "double" }
/** days since 1970-01-01 (type.h:318) */
case object DateT extends IcePrimitive { val typeString = "date" }
/** microseconds since midnight (type.h:334) */
case object TimeT extends IcePrimitive { val typeString = "time" }
/** microseconds since epoch, no zone (type.h:360) */
case object TimestampT extends IcePrimitive { val typeString = "timestamp" }
/** microseconds since epoch, UTC (type.h:379) */
case object TimestampTzT extends IcePrimitive { val typeString = "timestamptz" }
case object StringT extends IcePrimitive { val typeString = "string" }
case object BinaryT extends IcePrimitive { val typeString = "binary" }
/** 16-byte UUID, equivalent to fixed(16) (type.h:451) */
case object UuidT extends IcePrimitive { val typeString = "uuid" }

/** 128-bit-unscaled decimal, precision <= 38 (type.h:290-314) */
final case class DecimalT(precision: Int, scale: Int) extends IcePrimitive {
  require(precision >= 1 && precision <= 38, s"precision out of range: $precision")
  val typeString = s"decimal($precision, $scale)"
}

final case class FixedT(length: Int) extends IcePrimitive {
  val typeString = s"fixed[$length]"
}

/** A named, ID'd field of a struct (schema_field.h:38-88). */
final case class NestedField(
    id: Int,
    name: String,
    fieldType: IceType,
    required: Boolean,
    doc: Option[String] = None,
    initialDefault: Option[Any] = None,
    writeDefault: Option[Any] = None)

final case class StructT(fields: IndexedSeq[NestedField]) extends IceType {
  val typeString = "struct"
  private lazy val byId: Map[Int, NestedField] = fields.map(f => f.id -> f).toMap
  private lazy val byName: Map[String, NestedField] = fields.map(f => f.name -> f).toMap
  def field(id: Int): Option[NestedField] = byId.get(id)
  def fieldByName(name: String): Option[NestedField] = byName.get(name)
}

final case class ListT(elementId: Int, elementType: IceType, elementRequired: Boolean)
    extends IceType {
  val typeString = "list"
}

final case class MapT(
    keyId: Int, keyType: IceType,
    valueId: Int, valueType: IceType, valueRequired: Boolean)
    extends IceType {
  val typeString = "map"
}

object IceType {
  /** Parse a primitive type string per spec ("decimal(9, 2)", "fixed[16]", ...). */
  def fromPrimitiveString(s: String): IcePrimitive = {
    val Dec = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
    val Fix = """fixed\[\s*(\d+)\s*\]""".r
    s match {
      case "boolean" => BooleanT
      case "int" => IntT
      case "long" => LongT
      case "float" => FloatT
      case "double" => DoubleT
      case "date" => DateT
      case "time" => TimeT
      case "timestamp" => TimestampT
      case "timestamptz" => TimestampTzT
      case "string" => StringT
      case "binary" => BinaryT
      case "uuid" => UuidT
      case Dec(p, sc) => DecimalT(p.toInt, sc.toInt)
      case Fix(l) => FixedT(l.toInt)
      case other => throw new IllegalArgumentException(s"unknown primitive type: $other")
    }
  }
}

/** An Iceberg schema = a StructType + schema id (schema.h:46-52). */
final case class Schema(schemaId: Int, fields: IndexedSeq[NestedField],
    identifierFieldIds: Seq[Int] = Nil) {

  def struct: StructT = StructT(fields)

  /** All (fieldId -> field) pairs, recursing into nested types (schema.h:75). */
  lazy val allFieldsById: Map[Int, NestedField] = {
    val b = Map.newBuilder[Int, NestedField]
    def walk(t: IceType): Unit = t match {
      case StructT(fs) => fs.foreach { f => b += f.id -> f; walk(f.fieldType) }
      case ListT(eid, et, ereq) => b += eid -> NestedField(eid, "element", et, ereq); walk(et)
      case MapT(kid, kt, vid, vt, vreq) =>
        b += kid -> NestedField(kid, "key", kt, required = true)
        b += vid -> NestedField(vid, "value", vt, vreq)
        walk(kt); walk(vt)
      case _ =>
    }
    walk(struct)
    b.result()
  }

  /** Dotted-path name -> field id (schema.h:62-72, incl. nested paths). */
  lazy val idByName: Map[String, Int] = {
    val b = Map.newBuilder[String, Int]
    def walk(prefix: String, t: IceType): Unit = t match {
      case StructT(fs) => fs.foreach { f =>
        val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        b += p -> f.id; walk(p, f.fieldType)
      }
      case ListT(eid, et, _) =>
        b += s"$prefix.element" -> eid; walk(s"$prefix.element", et)
      case MapT(kid, kt, vid, vt, _) =>
        b += s"$prefix.key" -> kid; b += s"$prefix.value" -> vid
        walk(s"$prefix.key", kt); walk(s"$prefix.value", vt)
      case _ =>
    }
    walk("", struct)
    b.result()
  }

  def findFieldByName(name: String, caseSensitive: Boolean = true): Option[NestedField] = {
    val id =
      if (caseSensitive) idByName.get(name)
      else idByName.collectFirst { case (n, i) if n.equalsIgnoreCase(name) => i }
    id.flatMap(allFieldsById.get)
  }

  def findFieldById(id: Int): Option[NestedField] = allFieldsById.get(id)

  /** Top-level projection by names (schema.h:85). */
  def select(names: Seq[String], caseSensitive: Boolean = true): Schema =
    Schema(schemaId, names.map { n =>
      findFieldByName(n, caseSensitive).getOrElse(
        throw new IllegalArgumentException(s"no such column: $n"))
    }.toIndexedSeq)

  /** Top-level projection by field ids (schema.h:94). */
  def project(ids: Seq[Int]): Schema =
    Schema(schemaId, fields.filter(f => ids.contains(f.id)))

  def highestFieldId: Int =
    if (allFieldsById.isEmpty) 0 else allFieldsById.keys.max

  def toSpark: StructType = SparkConv.toSpark(this)
}

/** Iceberg <-> Spark type conversion (SURVEY §1.2 mapping table). */
object SparkConv {
  val FieldIdKey = "iceberg.id"
  val ParquetFieldIdKey = "parquet.field.id"
  val RequiredKey = "iceberg.required"

  def toSparkType(t: IceType): DataType = t match {
    case BooleanT => BooleanType
    case IntT => IntegerType
    case LongT => LongType
    case FloatT => FloatType
    case DoubleT => DoubleType
    case DateT => DateType
    case TimeT => LongType // µs since midnight by convention (no Spark TIME)
    case TimestampT => TimestampNTZType
    case TimestampTzT => TimestampType
    case StringT => StringType
    case BinaryT => BinaryType
    case UuidT => StringType // canonical string form
    case FixedT(_) => BinaryType
    case DecimalT(p, s) => DecimalType(p, s)
    case StructT(fs) => StructType(fs.map(toSparkField))
    case ListT(_, et, ereq) => ArrayType(toSparkType(et), containsNull = !ereq)
    case MapT(_, kt, _, vt, vreq) =>
      MapType(toSparkType(kt), toSparkType(vt), valueContainsNull = !vreq)
  }

  def toSparkField(f: NestedField): StructField = {
    val md = new MetadataBuilder()
      .putLong(FieldIdKey, f.id.toLong)
      .putLong(ParquetFieldIdKey, f.id.toLong)
      .build()
    StructField(f.name, toSparkType(f.fieldType), nullable = !f.required, md)
  }

  def toSpark(schema: Schema): StructType = StructType(schema.fields.map(toSparkField))

  /** Spark -> Iceberg, assigning fresh field IDs depth-first (used when
    * creating a table from an existing DataFrame). Mirrors how engines
    * assign ids on CREATE TABLE (last_column_id bookkeeping,
    * table_metadata.h:87). */
  def fromSpark(st: StructType): Schema = {
    var nextId = 0
    def alloc(): Int = { nextId += 1; nextId }
    // two passes per spec: top-level first then nested would match java impl;
    // simple depth-first is fine since we own both sides.
    def conv(dt: DataType): IceType = dt match {
      case BooleanType => BooleanT
      case ByteType | ShortType | IntegerType => IntT
      case LongType => LongT
      case FloatType => FloatT
      case DoubleType => DoubleT
      case DateType => DateT
      case TimestampNTZType => TimestampT
      case TimestampType => TimestampTzT
      case StringType => StringT
      case BinaryType => BinaryT
      case d: DecimalType => DecimalT(d.precision, d.scale)
      case ArrayType(et, containsNull) =>
        val eid = alloc()
        ListT(eid, conv(et), !containsNull)
      case MapType(kt, vt, valueContainsNull) =>
        val kid = alloc(); val vid = alloc()
        MapT(kid, conv(kt), vid, conv(vt), !valueContainsNull)
      case StructType(fs) =>
        StructT(fs.toIndexedSeq.map { f =>
          val id = alloc()
          NestedField(id, f.name, conv(f.dataType), required = !f.nullable)
        })
      case other => throw new IllegalArgumentException(s"unsupported Spark type: $other")
    }
    val fields = st.fields.toIndexedSeq.map { f =>
      val id = alloc()
      NestedField(id, f.name, conv(f.dataType), required = !f.nullable)
    }
    Schema(0, fields)
  }
}
