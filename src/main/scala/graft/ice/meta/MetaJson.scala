package graft.ice.meta

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.ice.transform.Transform
import graft.ice.types._

/** Table-metadata JSON serde, spec field names
  * (reference: src/iceberg/json_internal.cc, ~1150 LoC). Uses the Jackson
  * tree model shipped in /opt/spark/jars. */
object MetaJson {
  private[graft] val mapper = new ObjectMapper()

  // ---------- types ----------

  def typeToJson(t: IceType): JsonNode = t match {
    case p: IcePrimitive => mapper.getNodeFactory.textNode(p.typeString)
    case StructT(fields) =>
      val o = mapper.createObjectNode()
      o.put("type", "struct")
      val arr = o.putArray("fields")
      fields.foreach(f => arr.add(fieldToJson(f)))
      o
    case ListT(eid, et, ereq) =>
      val o = mapper.createObjectNode()
      o.put("type", "list")
      o.put("element-id", eid)
      o.set[ObjectNode]("element", typeToJson(et))
      o.put("element-required", ereq)
      o
    case MapT(kid, kt, vid, vt, vreq) =>
      val o = mapper.createObjectNode()
      o.put("type", "map")
      o.put("key-id", kid)
      o.set[ObjectNode]("key", typeToJson(kt))
      o.put("value-id", vid)
      o.set[ObjectNode]("value", typeToJson(vt))
      o.put("value-required", vreq)
      o
  }

  private def fieldToJson(f: NestedField): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("id", f.id)
    o.put("name", f.name)
    o.put("required", f.required)
    o.set[ObjectNode]("type", typeToJson(f.fieldType))
    f.doc.foreach(o.put("doc", _))
    // default values, JSON single-value serialization (spec Appendix D;
    // key names json_internal.cc:78-79)
    f.initialDefault.foreach(v =>
      o.set[JsonNode]("initial-default", SingleValueJson.toJson(f.fieldType, v)))
    f.writeDefault.foreach(v =>
      o.set[JsonNode]("write-default", SingleValueJson.toJson(f.fieldType, v)))
    o
  }

  def typeFromJson(n: JsonNode): IceType =
    if (n.isTextual) IceType.fromPrimitiveString(n.asText)
    else n.get("type").asText match {
      case "struct" =>
        StructT(n.get("fields").elements.asScala.map(fieldFromJson).toIndexedSeq)
      case "list" =>
        ListT(n.get("element-id").asInt, typeFromJson(n.get("element")),
          n.get("element-required").asBoolean)
      case "map" =>
        MapT(n.get("key-id").asInt, typeFromJson(n.get("key")),
          n.get("value-id").asInt, typeFromJson(n.get("value")),
          n.get("value-required").asBoolean)
      case other => throw new IllegalArgumentException(s"unknown type: $other")
    }

  private def fieldFromJson(n: JsonNode): NestedField = {
    require(n.has("id") && n.has("name") && n.has("type"),
      s"invalid schema field: $n")
    val tpe = typeFromJson(n.get("type"))
    def default(key: String): Option[Any] =
      Option(n.get(key)).filterNot(_.isNull).map(SingleValueJson.fromJson(tpe, _))
    NestedField(
      id = n.get("id").asInt,
      name = n.get("name").asText,
      fieldType = tpe,
      required = if (n.has("required")) n.get("required").asBoolean else false,
      doc = Option(n.get("doc")).map(_.asText),
      initialDefault = default("initial-default"),
      writeDefault = default("write-default"))
  }

  // ---------- schema ----------

  def schemaToJson(s: Schema): ObjectNode = {
    val o = typeToJson(s.struct).asInstanceOf[ObjectNode]
    o.put("schema-id", s.schemaId)
    if (s.identifierFieldIds.nonEmpty) {
      val arr = o.putArray("identifier-field-ids")
      s.identifierFieldIds.foreach(arr.add)
    }
    // keep spec field order: type, schema-id, [identifier-field-ids], fields
    o
  }

  def schemaFromJson(n: JsonNode): Schema = {
    require(n.has("type") && n.get("type").asText == "struct",
      s"schema must be a struct: $n")
    val st = typeFromJson(n).asInstanceOf[StructT]
    val ids = Option(n.get("identifier-field-ids"))
      .map(_.elements.asScala.map(_.asInt).toSeq).getOrElse(Nil)
    Schema(Option(n.get("schema-id")).map(_.asInt).getOrElse(0), st.fields, ids)
  }

  // ---------- partition spec / sort order ----------

  def specToJson(s: PartitionSpec): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("spec-id", s.specId)
    val arr = o.putArray("fields")
    s.fields.foreach { f =>
      val fo = arr.addObject()
      fo.put("name", f.name)
      fo.put("transform", f.transform.name)
      fo.put("source-id", f.sourceId)
      fo.put("field-id", f.fieldId)
    }
    o
  }

  def specFromJson(n: JsonNode): PartitionSpec =
    PartitionSpec(n.get("spec-id").asInt,
      n.get("fields").elements.asScala.zipWithIndex.map { case (f, i) =>
        PartitionField(
          sourceId = f.get("source-id").asInt,
          fieldId = Option(f.get("field-id")).map(_.asInt)
            .getOrElse(PartitionSpec.PartitionDataIdStart + i),
          name = f.get("name").asText,
          transform = Transform.fromString(f.get("transform").asText))
      }.toIndexedSeq)

  def sortOrderToJson(s: SortOrder): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("order-id", s.orderId)
    val arr = o.putArray("fields")
    s.fields.foreach { f =>
      val fo = arr.addObject()
      fo.put("transform", f.transform.name)
      fo.put("source-id", f.sourceId)
      fo.put("direction", if (f.ascending) "asc" else "desc")
      fo.put("null-order", if (f.nullsFirst) "nulls-first" else "nulls-last")
    }
    o
  }

  def sortOrderFromJson(n: JsonNode): SortOrder =
    SortOrder(n.get("order-id").asInt,
      n.get("fields").elements.asScala.map { f =>
        SortField(
          sourceId = f.get("source-id").asInt,
          transform = Transform.fromString(f.get("transform").asText),
          ascending = f.get("direction").asText == "asc",
          nullsFirst = f.get("null-order").asText == "nulls-first")
      }.toIndexedSeq)

  // ---------- snapshots / refs / logs / stats ----------

  def snapshotToJson(s: Snapshot): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("snapshot-id", s.snapshotId)
    s.parentSnapshotId.foreach(o.put("parent-snapshot-id", _))
    o.put("sequence-number", s.sequenceNumber)
    o.put("timestamp-ms", s.timestampMs)
    val sum = o.putObject("summary")
    s.summary.foreach { case (k, v) => sum.put(k, v) }
    o.put("manifest-list", s.manifestList)
    s.schemaId.foreach(o.put("schema-id", _))
    s.firstRowId.foreach(o.put("first-row-id", _))
    s.addedRows.foreach(o.put("added-rows", _))
    o
  }

  def snapshotFromJson(n: JsonNode): Snapshot =
    Snapshot(
      snapshotId = n.get("snapshot-id").asLong,
      parentSnapshotId = Option(n.get("parent-snapshot-id")).map(_.asLong),
      sequenceNumber = Option(n.get("sequence-number")).map(_.asLong).getOrElse(0L),
      timestampMs = n.get("timestamp-ms").asLong,
      manifestList = n.get("manifest-list").asText,
      summary = Option(n.get("summary")).map(s =>
        s.properties.asScala.map(e => e.getKey -> e.getValue.asText).toMap)
        .getOrElse(Map.empty),
      schemaId = Option(n.get("schema-id")).map(_.asInt),
      firstRowId = Option(n.get("first-row-id")).map(_.asLong),
      addedRows = Option(n.get("added-rows")).map(_.asLong))

  def refToJson(r: SnapshotRef): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("snapshot-id", r.snapshotId)
    o.put("type", r.refType)
    r.minSnapshotsToKeep.foreach(o.put("min-snapshots-to-keep", _))
    r.maxSnapshotAgeMs.foreach(o.put("max-snapshot-age-ms", _))
    r.maxRefAgeMs.foreach(o.put("max-ref-age-ms", _))
    o
  }

  def refFromJson(n: JsonNode): SnapshotRef =
    SnapshotRef(
      snapshotId = n.get("snapshot-id").asLong,
      refType = n.get("type").asText,
      minSnapshotsToKeep = Option(n.get("min-snapshots-to-keep")).map(_.asInt),
      maxSnapshotAgeMs = Option(n.get("max-snapshot-age-ms")).map(_.asLong),
      maxRefAgeMs = Option(n.get("max-ref-age-ms")).map(_.asLong))

  def statisticsFromJson(n: JsonNode): StatisticsFile =
    StatisticsFile(
      snapshotId = n.get("snapshot-id").asLong,
      path = n.get("statistics-path").asText,
      fileSizeInBytes = n.get("file-size-in-bytes").asLong,
      fileFooterSizeInBytes = n.get("file-footer-size-in-bytes").asLong,
      blobMetadata = Option(n.get("blob-metadata")).map(_.elements.asScala.map { b =>
        BlobMetadata(
          blobType = b.get("type").asText,
          sourceSnapshotId = b.get("snapshot-id").asLong,
          sourceSnapshotSequenceNumber = b.get("sequence-number").asLong,
          fields = b.get("fields").elements.asScala.map(_.asInt).toSeq,
          properties = Option(b.get("properties")).map(p =>
            p.properties.asScala.map(e => e.getKey -> e.getValue.asText).toMap)
            .getOrElse(Map.empty))
      }.toSeq).getOrElse(Nil))

  def statisticsToJson(s: StatisticsFile): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("snapshot-id", s.snapshotId)
    o.put("statistics-path", s.path)
    o.put("file-size-in-bytes", s.fileSizeInBytes)
    o.put("file-footer-size-in-bytes", s.fileFooterSizeInBytes)
    val arr = o.putArray("blob-metadata")
    s.blobMetadata.foreach { b =>
      val bo = arr.addObject()
      bo.put("type", b.blobType)
      bo.put("snapshot-id", b.sourceSnapshotId)
      bo.put("sequence-number", b.sourceSnapshotSequenceNumber)
      val fa = bo.putArray("fields")
      b.fields.foreach(fa.add)
      if (b.properties.nonEmpty) {
        val po = bo.putObject("properties")
        b.properties.foreach { case (k, v) => po.put(k, v) }
      }
    }
    o
  }

  // ---------- table metadata ----------

  def toJson(m: TableMetadata): String = {
    val o = mapper.createObjectNode()
    o.put("format-version", m.formatVersion)
    o.put("table-uuid", m.tableUuid)
    o.put("location", m.location)
    if (m.formatVersion >= 2) o.put("last-sequence-number", m.lastSequenceNumber)
    o.put("last-updated-ms", m.lastUpdatedMs)
    o.put("last-column-id", m.lastColumnId)
    o.put("current-schema-id", m.currentSchemaId)
    // v1 spec requires writers to ALSO emit the single "schema" and flat
    // "partition-spec" fields — strict v1 readers reject files without them
    if (m.formatVersion == 1) {
      o.set[ObjectNode]("schema", schemaToJson(m.currentSchema))
      o.set[ObjectNode]("partition-spec", specToJson(m.defaultSpec).get("fields"))
    }
    val schemasArr = o.putArray("schemas")
    m.schemas.foreach(s => schemasArr.add(schemaToJson(s)))
    o.put("default-spec-id", m.defaultSpecId)
    val specsArr = o.putArray("partition-specs")
    m.partitionSpecs.foreach(s => specsArr.add(specToJson(s)))
    o.put("last-partition-id", m.lastPartitionId)
    o.put("default-sort-order-id", m.defaultSortOrderId)
    val soArr = o.putArray("sort-orders")
    m.sortOrders.foreach(s => soArr.add(sortOrderToJson(s)))
    val props = o.putObject("properties")
    m.properties.foreach { case (k, v) => props.put(k, v) }
    m.currentSnapshotId.foreach(o.put("current-snapshot-id", _))
    val snapsArr = o.putArray("snapshots")
    m.snapshots.foreach(s => snapsArr.add(snapshotToJson(s)))
    val slArr = o.putArray("snapshot-log")
    m.snapshotLog.foreach { e =>
      val eo = slArr.addObject()
      eo.put("timestamp-ms", e.timestampMs)
      eo.put("snapshot-id", e.snapshotId)
    }
    val mlArr = o.putArray("metadata-log")
    m.metadataLog.foreach { e =>
      val eo = mlArr.addObject()
      eo.put("timestamp-ms", e.timestampMs)
      eo.put("metadata-file", e.metadataFile)
    }
    if (m.refs.nonEmpty) {
      val ro = o.putObject("refs")
      m.refs.foreach { case (name, r) => ro.set[ObjectNode](name, refToJson(r)) }
    }
    if (m.statistics.nonEmpty) {
      val sa = o.putArray("statistics")
      m.statistics.foreach(s => sa.add(statisticsToJson(s)))
    }
    if (m.partitionStatistics.nonEmpty) {
      val pa = o.putArray("partition-statistics")
      m.partitionStatistics.foreach { p =>
        val po = pa.addObject()
        po.put("snapshot-id", p.snapshotId)
        po.put("statistics-path", p.path)
        po.put("file-size-in-bytes", p.fileSizeInBytes)
      }
    }
    if (m.encryptionKeys.nonEmpty) {
      // v3-only field (Iceberg spec `encryption-keys`); writing it into
      // an older version would produce metadata other readers reject
      require(m.formatVersion >= 3,
        s"encryption-keys require format-version >= 3, got ${m.formatVersion}")
      val ea = o.putArray("encryption-keys")
      m.encryptionKeys.foreach { k =>
        val ko = ea.addObject()
        ko.put("key-id", k.keyId)
        ko.put("encrypted-key-metadata", k.encryptedKeyMetadata)
        k.encryptedById.foreach(ko.put("encrypted-by-id", _))
      }
    }
    m.nextRowId.foreach(o.put("next-row-id", _))
    mapper.writerWithDefaultPrettyPrinter.writeValueAsString(o)
  }

  def fromJson(json: String): TableMetadata = {
    val n = mapper.readTree(json)
    val fv = Option(n.get("format-version")).map(_.asInt)
      .getOrElse(throw new IllegalArgumentException("missing format-version"))
    if (!TableMetadata.SupportedVersions.contains(fv))
      throw new IllegalArgumentException(s"unsupported format version: $fv")

    // v1: single "schema" + flat "partition-spec"; v2+: arrays required
    val schemas: IndexedSeq[Schema] =
      if (n.has("schemas")) n.get("schemas").elements.asScala.map(schemaFromJson).toIndexedSeq
      else if (n.has("schema") && fv == 1) IndexedSeq(schemaFromJson(n.get("schema")))
      else throw new IllegalArgumentException("missing schemas")
    val currentSchemaId = Option(n.get("current-schema-id")).map(_.asInt)
      .getOrElse(schemas.head.schemaId)
    if (!schemas.exists(_.schemaId == currentSchemaId))
      throw new IllegalArgumentException(s"current-schema-id $currentSchemaId not found")

    val specs: IndexedSeq[PartitionSpec] =
      if (n.has("partition-specs"))
        n.get("partition-specs").elements.asScala.map(specFromJson).toIndexedSeq
      else if (fv == 1 && n.has("partition-spec")) {
        // v1 flat form: fields array without spec-id wrapper
        val fields = n.get("partition-spec").elements.asScala.zipWithIndex.map {
          case (f, i) =>
            PartitionField(
              sourceId = f.get("source-id").asInt,
              fieldId = Option(f.get("field-id")).map(_.asInt)
                .getOrElse(PartitionSpec.PartitionDataIdStart + i),
              name = f.get("name").asText,
              transform = Transform.fromString(f.get("transform").asText))
        }.toIndexedSeq
        IndexedSeq(PartitionSpec(0, fields))
      } else if (fv == 1) IndexedSeq(PartitionSpec.unpartitioned)
      else throw new IllegalArgumentException("missing partition-specs")

    val lastPartitionId = Option(n.get("last-partition-id")).map(_.asInt).getOrElse {
      if (fv == 1)
        specs.flatMap(_.fields.map(_.fieldId))
          .maxOption.getOrElse(PartitionSpec.PartitionDataIdStart - 1)
      else throw new IllegalArgumentException("missing last-partition-id")
    }

    val sortOrders: IndexedSeq[SortOrder] =
      if (n.has("sort-orders"))
        n.get("sort-orders").elements.asScala.map(sortOrderFromJson).toIndexedSeq
      else if (fv == 1) IndexedSeq(SortOrder.unsorted)
      else throw new IllegalArgumentException("missing sort-orders")

    TableMetadata(
      formatVersion = fv,
      tableUuid = Option(n.get("table-uuid")).map(_.asText).getOrElse(""),
      location = Option(n.get("location")).map(_.asText).getOrElse(""),
      lastSequenceNumber = Option(n.get("last-sequence-number")).map(_.asLong).getOrElse(0L),
      lastUpdatedMs = Option(n.get("last-updated-ms")).map(_.asLong).getOrElse(0L),
      lastColumnId = Option(n.get("last-column-id")).map(_.asInt)
        .getOrElse(schemas.map(_.highestFieldId).maxOption.getOrElse(0)),
      schemas = schemas,
      currentSchemaId = currentSchemaId,
      partitionSpecs = specs,
      defaultSpecId = Option(n.get("default-spec-id")).map(_.asInt)
        .getOrElse(specs.head.specId),
      lastPartitionId = lastPartitionId,
      properties = Option(n.get("properties")).map(p =>
        p.properties.asScala.map(e => e.getKey -> e.getValue.asText).toMap)
        .getOrElse(Map.empty),
      currentSnapshotId = Option(n.get("current-snapshot-id")).map(_.asLong)
        .filter(_ != -1L),
      snapshots = Option(n.get("snapshots")).map(
        _.elements.asScala.map(snapshotFromJson).toIndexedSeq)
        .getOrElse(IndexedSeq.empty),
      snapshotLog = Option(n.get("snapshot-log")).map(_.elements.asScala.map { e =>
        SnapshotLogEntry(e.get("timestamp-ms").asLong, e.get("snapshot-id").asLong)
      }.toIndexedSeq).getOrElse(IndexedSeq.empty),
      metadataLog = Option(n.get("metadata-log")).map(_.elements.asScala.map { e =>
        MetadataLogEntry(e.get("timestamp-ms").asLong, e.get("metadata-file").asText)
      }.toIndexedSeq).getOrElse(IndexedSeq.empty),
      sortOrders = sortOrders,
      defaultSortOrderId = Option(n.get("default-sort-order-id")).map(_.asInt)
        .getOrElse(sortOrders.head.orderId),
      refs = Option(n.get("refs")).map(r =>
        r.properties.asScala.map(e => e.getKey -> refFromJson(e.getValue)).toMap)
        .getOrElse(Map.empty),
      statistics = Option(n.get("statistics")).map(
        _.elements.asScala.map(statisticsFromJson).toSeq).getOrElse(Nil),
      partitionStatistics = Option(n.get("partition-statistics")).map(
        _.elements.asScala.map { p =>
          PartitionStatisticsFile(
            p.get("snapshot-id").asLong,
            p.get("statistics-path").asText,
            p.get("file-size-in-bytes").asLong)
        }.toSeq).getOrElse(Nil),
      nextRowId = Option(n.get("next-row-id")).map(_.asLong),
      encryptionKeys = Option(n.get("encryption-keys")).map(
        _.elements.asScala.map { k =>
          EncryptedKey(
            k.get("key-id").asText,
            k.get("encrypted-key-metadata").asText,
            Option(k.get("encrypted-by-id")).map(_.asText))
        }.toSeq).getOrElse(Nil))
  }
}

/** Read/write (optionally gzip'd) *.metadata.json
  * (reference: table_metadata.cc:165-195 codec sniff + read).
  * All bytes flow through the FileIO seam (S15). */
object TableMetadataIO {
  import graft.ice.io.{FileIO, LocalFileIO}

  def read(path: String, io: FileIO = LocalFileIO): TableMetadata = {
    val raw = io.readBytes(path)
    val text =
      if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b) {
        val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(raw))
        try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      } else new String(raw, java.nio.charset.StandardCharsets.UTF_8)
    MetaJson.fromJson(text)
  }

  /** Serialize honoring the table's own write.metadata.compression-codec
    * property (reference table_properties.h:226): "gzip" compresses, any
    * other value writes plain JSON. Readers sniff the magic bytes, so a
    * version history may freely mix codecs (e.g. the property toggled
    * mid-life). */
  def encode(m: TableMetadata): Array[Byte] = {
    val raw = MetaJson.toJson(m).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (TableProperties.get(m.properties,
        TableProperties.MetadataCompressionCodec) == "gzip") {
      val bos = new java.io.ByteArrayOutputStream(raw.length / 4 + 64)
      val gz = new java.util.zip.GZIPOutputStream(bos)
      try gz.write(raw) finally gz.close()
      bos.toByteArray
    } else raw
  }

  /** Atomic write (commit safety: readers never see a torn file). */
  def write(path: String, m: TableMetadata, io: FileIO = LocalFileIO): Unit =
    io.writeAtomic(path, encode(m))
}
