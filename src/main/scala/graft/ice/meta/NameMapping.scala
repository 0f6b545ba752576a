package graft.ice.meta

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Spec name mapping (`schema.name-mapping.default` table property;
  * reference: name_mapping.h:40-144): assigns Iceberg field ids to files
  * written WITHOUT ids by listing, per field, the names it may appear
  * under. Applied on the external-file read path before falling back to
  * pure current-name matching — without it, a rename makes old id-less
  * files resolve to the wrong (or no) column. */
final case class MappedField(
    fieldId: Option[Int],
    names: Seq[String],
    fields: Seq[MappedField] = Nil)

final case class NameMapping(fields: Seq[MappedField]) {

  /** All acceptable file-column names for a field id (top level). */
  def namesFor(fieldId: Int): Seq[String] =
    fields.filter(_.fieldId.contains(fieldId)).flatMap(_.names)

  /** Field id for a file-column name (top level). */
  def idFor(name: String): Option[Int] =
    fields.find(_.names.contains(name)).flatMap(_.fieldId)

  def toJson: String = NameMapping.toJson(this)
}

object NameMapping {
  private val mapper = new ObjectMapper()

  def fromJson(json: String): NameMapping = {
    val root = mapper.readTree(json)
    require(root.isArray, "name mapping must be a JSON array")
    NameMapping(root.elements.asScala.map(parseField).toSeq)
  }

  private def parseField(n: JsonNode): MappedField = {
    val names = Option(n.get("names"))
      .map(_.elements.asScala.map(_.asText).toSeq)
      .getOrElse(throw new IllegalArgumentException("mapped field missing names"))
    MappedField(
      fieldId = Option(n.get("field-id")).map(_.asInt),
      names = names,
      fields = Option(n.get("fields"))
        .map(_.elements.asScala.map(parseField).toSeq).getOrElse(Nil))
  }

  def toJson(nm: NameMapping): String = {
    val arr = mapper.createArrayNode()
    nm.fields.foreach(f => arr.add(fieldToJson(f)))
    mapper.writeValueAsString(arr)
  }

  private def fieldToJson(f: MappedField): ObjectNode = {
    val o = mapper.createObjectNode()
    f.fieldId.foreach(o.put("field-id", _))
    val names = o.putArray("names")
    f.names.foreach(names.add)
    if (f.fields.nonEmpty) {
      val fs = o.putArray("fields")
      f.fields.foreach(c => fs.add(fieldToJson(c)))
    }
    o
  }

  /** The default mapping for a schema: every field under its own name. */
  def fromSchema(schema: graft.ice.types.Schema): NameMapping =
    NameMapping(schema.fields.map(f => MappedField(Some(f.id), Seq(f.name))))

  val PropertyKey = "schema.name-mapping.default"
}
