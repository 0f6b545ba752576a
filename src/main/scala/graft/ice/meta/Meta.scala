package graft.ice.meta

import graft.ice.transform.Transform
import graft.ice.types._

/** Table metadata object model (reference: src/iceberg/table_metadata.h:69-130,
  * snapshot.h, partition_spec.h, sort_order.h). Immutable case classes;
  * mutations go through copy-on-write helpers (TableMetadata.builder-style
  * methods live on the case class itself). */

final case class PartitionField(sourceId: Int, fieldId: Int, name: String,
    transform: Transform)

final case class PartitionSpec(specId: Int, fields: IndexedSeq[PartitionField]) {
  /** Derived partition-tuple struct type (partition_spec.h:76). */
  def partitionType(schema: Schema): StructT =
    StructT(fields.map { pf =>
      val src = schema.findFieldById(pf.sourceId).getOrElse(
        throw new IllegalArgumentException(s"unknown source field ${pf.sourceId}"))
      val resultT = pf.transform.resultType(src.fieldType.asInstanceOf[IcePrimitive])
      NestedField(pf.fieldId, pf.name, resultT, required = false)
    })
  def isUnpartitioned: Boolean = fields.isEmpty
}

object PartitionSpec {
  val InitialSpecId = 0
  /** Partition field IDs start at 1000 (partition_field.h). */
  val PartitionDataIdStart = 1000
  val unpartitioned: PartitionSpec = PartitionSpec(InitialSpecId, IndexedSeq.empty)
}

final case class SortField(sourceId: Int, transform: Transform,
    ascending: Boolean, nullsFirst: Boolean)

final case class SortOrder(orderId: Int, fields: IndexedSeq[SortField])

object SortOrder {
  val unsorted: SortOrder = SortOrder(0, IndexedSeq.empty)
}

/** Snapshot summary operation values (snapshot.h:204-216). */
object DataOperation {
  val Append = "append"
  val Replace = "replace"
  val Overwrite = "overwrite"
  val Delete = "delete"
}

final case class Snapshot(
    snapshotId: Long,
    parentSnapshotId: Option[Long],
    sequenceNumber: Long,
    timestampMs: Long,
    manifestList: String,
    summary: Map[String, String],
    schemaId: Option[Int],
    firstRowId: Option[Long] = None,
    addedRows: Option[Long] = None) {
  def operation: Option[String] = summary.get("operation")
}

/** Branch/tag reference with retention config (snapshot.h:36-118). */
final case class SnapshotRef(
    snapshotId: Long,
    refType: String, // "branch" | "tag"
    minSnapshotsToKeep: Option[Int] = None,
    maxSnapshotAgeMs: Option[Long] = None,
    maxRefAgeMs: Option[Long] = None)

final case class SnapshotLogEntry(timestampMs: Long, snapshotId: Long)
final case class MetadataLogEntry(timestampMs: Long, metadataFile: String)

/** Puffin statistics metadata (statistics_file.h:35-81; metadata-only). */
final case class BlobMetadata(blobType: String, sourceSnapshotId: Long,
    sourceSnapshotSequenceNumber: Long, fields: Seq[Int],
    properties: Map[String, String])
final case class StatisticsFile(snapshotId: Long, path: String,
    fileSizeInBytes: Long, fileFooterSizeInBytes: Long,
    blobMetadata: Seq[BlobMetadata])
final case class PartitionStatisticsFile(snapshotId: Long, path: String,
    fileSizeInBytes: Long)

/** v3 table-encryption key entry (Iceberg spec `encryption-keys`;
  * reference declares the builder surface at table_metadata.h:368-376
  * but ships no serde). The key METADATA is opaque to the engine — it
  * is KMS-wrapped key material carried base64 in the table metadata;
  * nothing here decrypts anything. */
final case class EncryptedKey(
    keyId: String,
    /** base64-encoded wrapped key material */
    encryptedKeyMetadata: String,
    /** id of the key that wrapped this one (KMS hierarchy), if any */
    encryptedById: Option[String] = None)

final case class TableMetadata(
    formatVersion: Int,
    tableUuid: String,
    location: String,
    lastSequenceNumber: Long,
    lastUpdatedMs: Long,
    lastColumnId: Int,
    schemas: IndexedSeq[Schema],
    currentSchemaId: Int,
    partitionSpecs: IndexedSeq[PartitionSpec],
    defaultSpecId: Int,
    lastPartitionId: Int,
    properties: Map[String, String],
    currentSnapshotId: Option[Long],
    snapshots: IndexedSeq[Snapshot],
    snapshotLog: IndexedSeq[SnapshotLogEntry],
    metadataLog: IndexedSeq[MetadataLogEntry],
    sortOrders: IndexedSeq[SortOrder],
    defaultSortOrderId: Int,
    refs: Map[String, SnapshotRef],
    statistics: Seq[StatisticsFile] = Nil,
    partitionStatistics: Seq[PartitionStatisticsFile] = Nil,
    nextRowId: Option[Long] = None,
    encryptionKeys: Seq[EncryptedKey] = Nil) {

  def currentSchema: Schema = schemas.find(_.schemaId == currentSchemaId)
    .getOrElse(throw new IllegalStateException(s"current schema $currentSchemaId not found"))
  def schemaById(id: Int): Option[Schema] = schemas.find(_.schemaId == id)
  def defaultSpec: PartitionSpec = partitionSpecs.find(_.specId == defaultSpecId)
    .getOrElse(PartitionSpec.unpartitioned)
  def specById(id: Int): Option[PartitionSpec] = partitionSpecs.find(_.specId == id)
  def defaultSortOrder: SortOrder = sortOrders.find(_.orderId == defaultSortOrderId)
    .getOrElse(SortOrder.unsorted)
  def currentSnapshot: Option[Snapshot] =
    currentSnapshotId.flatMap(id => snapshots.find(_.snapshotId == id))
  def snapshotById(id: Long): Option[Snapshot] = snapshots.find(_.snapshotId == id)
  def ref(name: String): Option[SnapshotRef] = refs.get(name)

  /** Add an encryption key (reference builder AddEncryptionKey,
    * table_metadata.h:368-376 — declared there, executable here).
    * v3-only: earlier format versions have no `encryption-keys` field.
    * Replaces an existing entry with the same key-id (idempotent
    * re-registration, e.g. after a KMS re-wrap). */
  def withEncryptionKey(key: EncryptedKey): TableMetadata = {
    require(formatVersion >= 3,
      s"encryption-keys require format-version >= 3, table is v$formatVersion")
    copy(encryptionKeys =
      encryptionKeys.filterNot(_.keyId == key.keyId) :+ key)
  }

  /** Remove an encryption key by id (reference RemoveEncryptionKey).
    * Unknown ids refuse loudly — silently "removing" a key that is not
    * registered usually means the caller holds a stale key-id and data
    * written under the real one would become unreadable. */
  def withoutEncryptionKey(keyId: String): TableMetadata = {
    require(encryptionKeys.exists(_.keyId == keyId),
      s"unknown encryption key-id '$keyId'")
    copy(encryptionKeys = encryptionKeys.filterNot(_.keyId == keyId))
  }

  /** Append a snapshot and move a branch ref to it (table_metadata.cc:367-380). */
  def withSnapshot(s: Snapshot, branch: String = "main"): TableMetadata = {
    val newRefs = refs.updated(branch, refs.get(branch) match {
      case Some(r) => r.copy(snapshotId = s.snapshotId)
      case None => SnapshotRef(s.snapshotId, "branch")
    })
    val isMain = branch == "main"
    copy(
      lastSequenceNumber = math.max(lastSequenceNumber, s.sequenceNumber),
      lastUpdatedMs = s.timestampMs,
      currentSnapshotId = if (isMain) Some(s.snapshotId) else currentSnapshotId,
      snapshots = snapshots :+ s,
      snapshotLog =
        if (isMain) snapshotLog :+ SnapshotLogEntry(s.timestampMs, s.snapshotId)
        else snapshotLog,
      refs = newRefs)
  }

  /** Add a snapshot WITHOUT moving any ref, the snapshot log, or the
    * current pointer — Iceberg's write-audit-publish staging (a write
    * under `spark.wap.id`): the snapshot exists, is addressable by id
    * and carries `wap.id` in its summary, but no reader sees it until
    * `publish_changes` cherry-picks it onto main. */
  def withStagedSnapshot(s: Snapshot): TableMetadata =
    copy(
      lastSequenceNumber = math.max(lastSequenceNumber, s.sequenceNumber),
      lastUpdatedMs = s.timestampMs,
      snapshots = snapshots :+ s)

  def withProperties(props: Map[String, String]): TableMetadata =
    copy(properties = properties ++ props)

  /** Typed property access with registry defaults (C9). */
  def property[T](key: TableProperties.Key[T]): T =
    TableProperties.get(properties, key)
}

object TableMetadata {
  val InitialSequenceNumber = 0L
  val SupportedVersions: Set[Int] = Set(1, 2, 3)

  /** Fresh metadata for a new table (CREATE TABLE path; mirrors
    * TableMetadataBuilder defaults, table_metadata.h:161-406). */
  def newTable(location: String, schema: Schema,
      spec: PartitionSpec = PartitionSpec.unpartitioned,
      sortOrder: SortOrder = SortOrder.unsorted,
      properties: Map[String, String] = Map.empty,
      formatVersion: Int = 2): TableMetadata = {
    val schema0 = if (schema.schemaId == 0) schema else schema.copy(schemaId = 0)
    // "format-version" is a CREATE-time property that selects the spec
    // version, then is consumed rather than stored (table_metadata.h:69)
    val fv = TableProperties.get(properties,
      TableProperties.FormatVersion.copy(default = formatVersion))
    require(SupportedVersions.contains(fv), s"unsupported format version: $fv")
    // reserved keys (reserved_properties()): format-version is the one
    // legitimate create-time input — and is consumed, not stored
    TableProperties.validateUnreserved(properties.keys, allowFormatVersion = true)
    TableProperties.validateValues(properties)
    TableMetadata(
      formatVersion = fv,
      tableUuid = java.util.UUID.randomUUID().toString,
      location = location,
      lastSequenceNumber = InitialSequenceNumber,
      lastUpdatedMs = System.currentTimeMillis(),
      lastColumnId = schema0.highestFieldId,
      schemas = IndexedSeq(schema0),
      currentSchemaId = 0,
      partitionSpecs = IndexedSeq(spec),
      defaultSpecId = spec.specId,
      lastPartitionId = if (spec.fields.isEmpty) PartitionSpec.PartitionDataIdStart - 1
        else spec.fields.map(_.fieldId).max,
      properties = properties - TableProperties.FormatVersion.name,
      currentSnapshotId = None,
      snapshots = IndexedSeq.empty,
      snapshotLog = IndexedSeq.empty,
      metadataLog = IndexedSeq.empty,
      sortOrders = IndexedSeq(sortOrder),
      defaultSortOrderId = sortOrder.orderId,
      refs = Map.empty)
  }
}
