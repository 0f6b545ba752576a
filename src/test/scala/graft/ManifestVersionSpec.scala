package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ice.manifest._
import graft.ice.types._

/** Versioned manifest writers (manifest_writer.h MakeV{1,2,3}Writer;
  * adapters v1_metadata.cc / v3_metadata.cc): write each version, read
  * back, check version-specific fields round-trip or are absent. */
class ManifestVersionSpec extends AnyFunSuite {

  private val partType = StructT(IndexedSeq(
    NestedField(1000, "bkt", IntT, required = false)))

  private def entry(firstRowId: Option[Long] = None) =
    ManifestEntry(ManifestStatus.Added, None, None, None,
      DataFile(FileContent.Data, "/data/f1.parquet", "PARQUET",
        IndexedSeq(3), recordCount = 10, fileSizeInBytes = 1234,
        valueCounts = Map(1 -> 10L),
        lowerBounds = Map(1 -> Literal.long(1).serialize),
        upperBounds = Map(1 -> Literal.long(9).serialize),
        sortOrderId = Some(0),
        firstRowId = firstRowId))

  test("v1 manifest: no sequence fields, required snapshot_id, block size") {
    val dir = java.nio.file.Files.createTempDirectory("mv1").toString
    val mf = ManifestAvro.writeManifest(s"$dir/m.avro", Seq(entry()), partType,
      specId = 0, snapshotId = 7L, sequenceNumber = 0L, formatVersion = 1)
    assert(mf.addedFilesCount == Some(1))
    val back = ManifestAvro.readManifest(s"$dir/m.avro", partType, Some(mf))
    assert(back.size == 1)
    assert(back.head.snapshotId == Some(7L)) // required field written directly
    assert(back.head.dataFile.partition == IndexedSeq(3))
    assert(back.head.dataFile.valueCounts == Map(1 -> 10L))
    // schema truly lacks v2 fields
    val schemaJson = ManifestAvro.manifestEntrySchemaJson(partType, 1)
    assert(!schemaJson.contains("sequence_number"))
    assert(!schemaJson.contains("\"content\""))
    assert(schemaJson.contains("block_size_in_bytes"))
  }

  test("v3 manifest: first_row_id / content_offset round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("mv3").toString
    val e = entry(firstRowId = Some(42L)).copy(
      dataFile = entry().dataFile.copy(
        firstRowId = Some(42L), contentOffset = Some(100L),
        contentSizeInBytes = Some(5000L)))
    val mf = ManifestAvro.writeManifest(s"$dir/m.avro", Seq(e), partType,
      specId = 0, snapshotId = 7L, sequenceNumber = 3L, formatVersion = 3)
    val back = ManifestAvro.readManifest(s"$dir/m.avro", partType, Some(mf))
    assert(back.head.dataFile.firstRowId == Some(42L))
    assert(back.head.dataFile.contentOffset == Some(100L))
    assert(back.head.dataFile.contentSizeInBytes == Some(5000L))
    assert(back.head.sequenceNumber == Some(3L))
  }

  test("v1 manifest list: no content/sequence columns; v3 adds first_row_id") {
    val dir = java.nio.file.Files.createTempDirectory("mlv").toString
    val mf = ManifestFile(
      manifestPath = s"$dir/m.avro", manifestLength = 100, partitionSpecId = 0,
      addedSnapshotId = 7L, addedFilesCount = Some(1),
      existingFilesCount = Some(0), deletedFilesCount = Some(0),
      addedRowsCount = Some(10L), existingRowsCount = Some(0L),
      deletedRowsCount = Some(0L), firstRowId = Some(1000L))
    ManifestAvro.writeManifestList(s"$dir/v1.avro", Seq(mf), 7L, None, 0L,
      formatVersion = 1)
    val v1back = ManifestAvro.readManifestList(s"$dir/v1.avro")
    assert(v1back.head.sequenceNumber == 0L) // defaulted, not stored
    assert(v1back.head.content == ManifestContent.Data)

    ManifestAvro.writeManifestList(s"$dir/v3.avro", Seq(mf.copy(sequenceNumber = 5L,
      minSequenceNumber = 2L)), 7L, None, 5L, formatVersion = 3)
    val v3back = ManifestAvro.readManifestList(s"$dir/v3.avro")
    assert(v3back.head.sequenceNumber == 5L)
    assert(v3back.head.firstRowId == Some(1000L))

    // a delete manifest cannot be written into a v1 list (no content
    // field — it would read back as Data and be planned as data files)
    val delMf = mf.copy(content = ManifestContent.Deletes)
    assertThrows[IllegalArgumentException](
      ManifestAvro.writeManifestList(s"$dir/v1-del.avro", Seq(delMf), 7L, None, 0L,
        formatVersion = 1))
    // but v2 accepts it and round-trips the content marker
    ManifestAvro.writeManifestList(s"$dir/v2-del.avro", Seq(delMf), 7L, None, 0L,
      formatVersion = 2)
    assert(ManifestAvro.readManifestList(s"$dir/v2-del.avro").head.content ==
      ManifestContent.Deletes)
  }
}
