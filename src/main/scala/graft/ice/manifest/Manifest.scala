package graft.ice.manifest

import graft.ice.types._

/** Manifest object model (reference: src/iceberg/manifest_entry.h,
  * manifest_list.h). Pure metadata-plane case classes; Avro IO lives in
  * ManifestAvro. */

object ManifestStatus {
  val Existing = 0
  val Added = 1
  val Deleted = 2
}

object FileContent {
  val Data = 0
  val PositionDeletes = 1
  val EqualityDeletes = 2
}

/** DataFile (manifest_entry.h:61-177). `partition` holds the partition
  * tuple in Iceberg runtime repr (date=Int days, timestamp=Long µs,
  * decimal=java BigDecimal, binary=Array[Byte]), ordered per spec. */
final case class DataFile(
    content: Int,
    filePath: String,
    fileFormat: String, // "PARQUET" | "AVRO" | "ORC"
    partition: IndexedSeq[Any],
    recordCount: Long,
    fileSizeInBytes: Long,
    columnSizes: Map[Int, Long] = Map.empty,
    valueCounts: Map[Int, Long] = Map.empty,
    nullValueCounts: Map[Int, Long] = Map.empty,
    nanValueCounts: Map[Int, Long] = Map.empty,
    lowerBounds: Map[Int, Array[Byte]] = Map.empty,
    upperBounds: Map[Int, Array[Byte]] = Map.empty,
    keyMetadata: Option[Array[Byte]] = None,
    splitOffsets: Seq[Long] = Nil,
    equalityIds: Seq[Int] = Nil,
    sortOrderId: Option[Int] = None,
    firstRowId: Option[Long] = None,
    referencedDataFile: Option[String] = None,
    contentOffset: Option[Long] = None,
    contentSizeInBytes: Option[Long] = None)

/** ManifestEntry (manifest_entry.h:276-315). Nullable tracking fields
  * inherit from the containing manifest (inheritable_metadata.h:40-109);
  * `specId` is the containing manifest's partition-spec id (not stored in
  * the entry itself — inherited at read time, like the C++ reference's
  * inheritable metadata). */
final case class ManifestEntry(
    status: Int,
    snapshotId: Option[Long],
    sequenceNumber: Option[Long],
    fileSequenceNumber: Option[Long],
    dataFile: DataFile,
    specId: Int = 0) {
  def isLive: Boolean = status != ManifestStatus.Deleted
}

/** PartitionFieldSummary (manifest_list.h:40-73). */
final case class PartitionFieldSummary(
    containsNull: Boolean,
    containsNan: Option[Boolean] = None,
    lowerBound: Option[Array[Byte]] = None,
    upperBound: Option[Array[Byte]] = None)

object ManifestContent {
  val Data = 0
  val Deletes = 1
}

/** ManifestFile — an entry in the manifest list (manifest_list.h:76-215). */
final case class ManifestFile(
    manifestPath: String,
    manifestLength: Long,
    partitionSpecId: Int,
    content: Int = ManifestContent.Data,
    sequenceNumber: Long = 0L,
    minSequenceNumber: Long = 0L,
    addedSnapshotId: Long,
    addedFilesCount: Option[Int] = None,
    existingFilesCount: Option[Int] = None,
    deletedFilesCount: Option[Int] = None,
    addedRowsCount: Option[Long] = None,
    existingRowsCount: Option[Long] = None,
    deletedRowsCount: Option[Long] = None,
    partitions: IndexedSeq[PartitionFieldSummary] = IndexedSeq.empty,
    keyMetadata: Option[Array[Byte]] = None,
    firstRowId: Option[Long] = None) {
  def hasAddedFiles: Boolean = addedFilesCount.forall(_ > 0)
  def hasExistingFiles: Boolean = existingFilesCount.forall(_ > 0)
  def hasDeletedFiles: Boolean = deletedFilesCount.forall(_ > 0)
}

/** Metadata inheritance (reference: inheritable_metadata.h:40-109):
  * entries read from a manifest inherit the manifest's snapshot id and
  * sequence numbers when null; -1 sequence numbers (unassigned during
  * concurrent commits) also resolve to the manifest's. */
object InheritableMetadata {
  def apply(manifest: ManifestFile)(e: ManifestEntry): ManifestEntry = {
    val snap = e.snapshotId.orElse(Some(manifest.addedSnapshotId))
    val seq =
      if (e.sequenceNumber.isEmpty || e.sequenceNumber.contains(-1L)) {
        if (e.status == ManifestStatus.Added || manifest.sequenceNumber == 0L)
          Some(manifest.sequenceNumber)
        else e.sequenceNumber
      } else e.sequenceNumber
    val fileSeq =
      if (e.fileSequenceNumber.isEmpty || e.fileSequenceNumber.contains(-1L)) {
        if (e.status == ManifestStatus.Added || manifest.sequenceNumber == 0L)
          Some(manifest.sequenceNumber)
        else e.fileSequenceNumber
      } else e.fileSequenceNumber
    e.copy(snapshotId = snap, sequenceNumber = seq, fileSequenceNumber = fileSeq,
      specId = manifest.partitionSpecId)
  }
}
