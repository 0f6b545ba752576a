package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ice.manifest._
import graft.ice.meta._
import graft.ice.types._

/** Complete spec-conformance sweep over EVERY golden resource the
  * reference ships (`src/iceberg/test/resources`): all five manifest
  * lists (manifest_list_reader_writer_test.cc:314-371 expectations,
  * field by field), both manifests (manifest_reader_writer_test.cc:
  * 93-305 incl. the metadata-inheritance wrapper), every positive
  * metadata JSON, and every negative metadata JSON
  * (metadata_serde_test.cc). The final test enumerates the directory
  * and fails if a resource file exists that no test here covers — the
  * read-side interop claim holds for the whole fixture set, zero skips.
  */
class GoldenResourceSpec extends AnyFunSuite {
  private val res = "/root/reference/src/iceberg/test/resources"

  private def longOf(b: Array[Byte]): Long =
    Conversions.fromBytes(LongT, b).asInstanceOf[Long]
  private def intOf(b: Array[Byte]): Int =
    Conversions.fromBytes(IntT, b).asInstanceOf[Int]
  private def strOf(b: Array[Byte]): String = new String(b, "UTF-8")

  // ---- manifest lists: v1 ----

  test("snap-7532614258660258098 (v1 PartitionedTest) field-by-field") {
    val fs = ManifestAvro.readManifestList(
      s"$res/snap-7532614258660258098-1-eafd2972-f58e-4185-9237-6378f564787e.avro")
    assert(fs.size == 2)
    val Seq(m0, m1) = fs.toSeq
    assert(m0.manifestPath == "iceberg-warehouse/db/v1_partition_test/metadata/" +
      "eafd2972-f58e-4185-9237-6378f564787e-m1.avro")
    assert(m1.manifestPath == "iceberg-warehouse/db/v1_partition_test/metadata/" +
      "eafd2972-f58e-4185-9237-6378f564787e-m0.avro")
    assert(m0.manifestLength == 6185 && m1.manifestLength == 6113)
    fs.foreach { m =>
      assert(m.partitionSpecId == 0)
      assert(m.addedSnapshotId == 7532614258660258098L)
      assert(m.content == ManifestContent.Data)
      assert(m.sequenceNumber == 0 && m.minSequenceNumber == 0) // v1 defaults
      assert(m.existingFilesCount == Some(0) && m.existingRowsCount == Some(0L))
      assert(m.partitions.size == 1)
      val p = m.partitions.head
      assert(!p.containsNull && p.containsNan == Some(false))
    }
    assert(m0.addedFilesCount == Some(4) && m0.addedRowsCount == Some(6L))
    assert(m0.deletedFilesCount == Some(0) && m0.deletedRowsCount == Some(0L))
    assert(strOf(m0.partitions.head.lowerBound.get) == "2022-02-22")
    assert(strOf(m0.partitions.head.upperBound.get) == "2022-2-23")
    assert(m1.addedFilesCount == Some(0) && m1.addedRowsCount == Some(0L))
    assert(m1.deletedFilesCount == Some(2) && m1.deletedRowsCount == Some(6L))
    assert(strOf(m1.partitions.head.lowerBound.get) == "2022-2-22")
    assert(strOf(m1.partitions.head.upperBound.get) == "2022-2-23")
  }

  test("snap-4134160420377642835 (v1 ComplexTypeTest) field-by-field") {
    val fs = ManifestAvro.readManifestList(
      s"$res/snap-4134160420377642835-1-aeffe099-3bac-4011-bc17-5875210d8dc0.avro")
    assert(fs.size == 2)
    val Seq(m0, m1) = fs.toSeq
    assert(m0.manifestPath == "iceberg-warehouse/db/v1_type_test/metadata/" +
      "aeffe099-3bac-4011-bc17-5875210d8dc0-m1.avro")
    assert(m1.manifestPath == "iceberg-warehouse/db/v1_type_test/metadata/" +
      "aeffe099-3bac-4011-bc17-5875210d8dc0-m0.avro")
    assert(m0.manifestLength == 6498 && m1.manifestLength == 6513)
    fs.foreach { m =>
      assert(m.partitionSpecId == 0)
      assert(m.addedSnapshotId == 4134160420377642835L)
      assert(m.content == ManifestContent.Data)
      assert(m.existingFilesCount == Some(0) && m.existingRowsCount == Some(0L))
    }
    assert(m0.addedFilesCount == Some(1) && m0.addedRowsCount == Some(2L))
    assert(m0.deletedFilesCount == Some(0) && m0.deletedRowsCount == Some(0L))
    assert(m1.addedFilesCount == Some(0) && m1.addedRowsCount == Some(0L))
    assert(m1.deletedFilesCount == Some(1) && m1.deletedRowsCount == Some(3L))
  }

  test("snap-7522296285847100621 (v1 ComplexPartitionedTest) field-by-field") {
    val fs = ManifestAvro.readManifestList(
      s"$res/snap-7522296285847100621-1-5d690750-8fb4-4cd1-8ae7-85c7b39abe14.avro")
    assert(fs.size == 2)
    val Seq(m0, m1) = fs.toSeq
    assert(m0.manifestPath == "iceberg-warehouse/db2/v1_complex_partition_test/" +
      "metadata/5d690750-8fb4-4cd1-8ae7-85c7b39abe14-m0.avro")
    assert(m1.manifestPath == "iceberg-warehouse/db2/v1_complex_partition_test/" +
      "metadata/5d690750-8fb4-4cd1-8ae7-85c7b39abe14-m1.avro")
    assert(m0.manifestLength == 6402 && m1.manifestLength == 6318)
    fs.foreach { m =>
      assert(m.partitionSpecId == 0)
      assert(m.addedSnapshotId == 7522296285847100621L)
      assert(m.addedFilesCount == Some(0) && m.addedRowsCount == Some(0L))
      assert(m.partitions.size == 2)
      m.partitions.foreach(p =>
        assert(!p.containsNull && p.containsNan == Some(false)))
    }
    assert(m0.existingFilesCount == Some(3) && m0.existingRowsCount == Some(4L))
    assert(m0.deletedFilesCount == Some(1) && m0.deletedRowsCount == Some(2L))
    assert(m1.existingFilesCount == Some(1) && m1.existingRowsCount == Some(1L))
    assert(m1.deletedFilesCount == Some(1) && m1.deletedRowsCount == Some(1L))
    // two partition fields: a string date and a little-endian long
    assert(strOf(m0.partitions(0).lowerBound.get) == "2022-2-22")
    assert(strOf(m0.partitions(0).upperBound.get) == "2022-2-24")
    assert(longOf(m0.partitions(1).lowerBound.get) == 2L)
    assert(longOf(m0.partitions(1).upperBound.get) == 5L)
    assert(strOf(m1.partitions(0).lowerBound.get) == "2022-2-22")
    assert(strOf(m1.partitions(0).upperBound.get) == "2022-2-23")
    assert(longOf(m1.partitions(1).lowerBound.get) == 2L)
    assert(longOf(m1.partitions(1).upperBound.get) == 4L)
  }

  // ---- manifest lists: v2 ----

  test("snap-7412193043800610213 (v2 PartitionedTest) field-by-field") {
    val fs = ManifestAvro.readManifestList(
      s"$res/snap-7412193043800610213-1-2bccd69e-d642-4816-bba0-261cd9bd0d93.avro")
    assert(fs.size == 4)
    val paths = Seq("2bccd69e-d642-4816-bba0-261cd9bd0d93-m0.avro",
      "9b6ffacd-ef10-4abf-a89c-01c733696796-m0.avro",
      "2541e6b5-4923-4bd5-886d-72c6f7228400-m0.avro",
      "3118c801-d2e0-4df6-8c7a-7d4eaade32f8-m0.avro")
    val sizes = Seq(7433L, 7431L, 7433L, 7431L)
    val snaps = Seq(7412193043800610213L, 5485972788975780755L,
      1679468743751242972L, 1579605567338877265L)
    val bounds = Seq(473976, 465192, 447696, 447672)
    fs.zipWithIndex.foreach { case (m, i) =>
      assert(m.manifestPath == s"/tmp/db/db/iceberg_test/metadata/${paths(i)}")
      assert(m.manifestLength == sizes(i))
      assert(m.partitionSpecId == 0)
      assert(m.content == ManifestContent.Data)
      assert(m.sequenceNumber == 4 - i && m.minSequenceNumber == 4 - i)
      assert(m.addedSnapshotId == snaps(i))
      assert(m.addedFilesCount == Some(1) && m.addedRowsCount == Some(1L))
      assert(m.existingFilesCount == Some(0) && m.deletedFilesCount == Some(0))
      assert(m.partitions.size == 1)
      val p = m.partitions.head
      assert(!p.containsNull && p.containsNan == Some(false))
      assert(intOf(p.lowerBound.get) == bounds(i))
      assert(intOf(p.upperBound.get) == bounds(i))
    }
  }

  test("snap-251167482216575399 (v2 NonPartitionedTest) field-by-field") {
    val fs = ManifestAvro.readManifestList(
      s"$res/snap-251167482216575399-1-ccb6dbcb-0611-48da-be68-bd506ea63188.avro")
    assert(fs.size == 4)
    val paths = Seq("ccb6dbcb-0611-48da-be68-bd506ea63188-m0.avro",
      "b89a10c9-a7a8-4526-99c5-5587a4ea7527-m0.avro",
      "a74d20fa-c800-4706-9ddb-66be15a5ecb0-m0.avro",
      "ae7d5fce-7245-4335-9b57-bc598c595c84-m0.avro")
    val sizes = Seq(7169L, 7170L, 7169L, 7170L)
    val snaps = Seq(251167482216575399L, 4248697313956014690L,
      281757490425433194L, 5521202581490753283L)
    fs.zipWithIndex.foreach { case (m, i) =>
      assert(m.manifestPath ==
        s"/tmp/db/db/v2_non_partitioned_test/metadata/${paths(i)}")
      assert(m.manifestLength == sizes(i))
      assert(m.partitionSpecId == 0)
      assert(m.partitions.isEmpty)
      assert(m.content == ManifestContent.Data)
      assert(m.sequenceNumber == 4 - i && m.minSequenceNumber == 4 - i)
      assert(m.addedSnapshotId == snaps(i))
      assert(m.addedFilesCount == Some(1) && m.addedRowsCount == Some(1L))
      assert(m.existingFilesCount == Some(0) && m.deletedFilesCount == Some(0))
    }
  }

  // ---- manifests ----

  test("56357cd7-m4 (v1 partitioned manifest) entries field-by-field") {
    val partType = StructT(IndexedSeq(
      NestedField(1000, "order_ts_hour", IntT, required = true)))
    val entries = ManifestAvro.readManifest(
      s"$res/56357cd7-391f-4df8-aa24-e7e667da8870-m4.avro", partType)
    assert(entries.size == 4)
    val paths = Seq(
      "order_ts_hour=2021-01-27-00/00000-2-d5ae78b7-4449-45ec-adb7-c0e9c0bdb714-0-00001.parquet",
      "order_ts_hour=2024-01-27-00/00000-2-d5ae78b7-4449-45ec-adb7-c0e9c0bdb714-0-00002.parquet",
      "order_ts_hour=2023-01-26-00/00000-2-d5ae78b7-4449-45ec-adb7-c0e9c0bdb714-0-00003.parquet",
      "order_ts_hour=2021-01-26-00/00000-2-d5ae78b7-4449-45ec-adb7-c0e9c0bdb714-0-00004.parquet")
    val partitions = Seq(447696, 473976, 465192, 447672)
    // per-entry (long, long, decimal-unscaled, timestamp-micros) bounds —
    // lower == upper (single-row files)
    val boundVals = Seq(
      (1234L, 5678L, 4834L, 1611706223000000L),
      (1234L, 5678L, 4835L, 1706314223000000L),
      (123L, 456L, 3618L, 1674691823000000L),
      (123L, 456L, 3617L, 1611619823000000L))
    entries.zipWithIndex.foreach { case (e, i) =>
      assert(e.status == ManifestStatus.Added)
      assert(e.snapshotId == Some(6387266376565973956L))
      val f = e.dataFile
      assert(f.filePath == s"/tmp/db/db/iceberg_test/data/${paths(i)}")
      assert(f.fileFormat == "PARQUET")
      assert(f.partition == IndexedSeq(partitions(i)))
      assert(f.recordCount == 1 && f.fileSizeInBytes == 1375)
      assert(f.columnSizes == Map(1 -> 49L, 2 -> 49L, 3 -> 49L, 4 -> 49L))
      assert(f.valueCounts == Map(1 -> 1L, 2 -> 1L, 3 -> 1L, 4 -> 1L))
      assert(f.nullValueCounts == Map(1 -> 0L, 2 -> 0L, 3 -> 0L, 4 -> 0L))
      assert(f.splitOffsets == Seq(4L))
      assert(f.sortOrderId == Some(0))
      val (c1, c2, c3, c4) = boundVals(i)
      Seq(f.lowerBounds, f.upperBounds).foreach { b =>
        assert(longOf(b(1)) == c1)
        assert(longOf(b(2)) == c2)
        assert(Conversions.fromBytes(DecimalT(10, 2), b(3))
          .asInstanceOf[java.math.BigDecimal].unscaledValue.longValue == c3)
        assert(Conversions.fromBytes(TimestampT, b(4)) == c4)
      }
    }
  }

  test("2ddf1bc9-m0 (v2 manifest) entry field-by-field + inheritance wrapper") {
    def checkEntry(e: ManifestEntry): Unit = {
      assert(e.status == ManifestStatus.Added)
      assert(e.snapshotId == Some(679879563479918846L))
      val f = e.dataFile
      assert(f.filePath == "/tmp/db/db/v2_manifest_non_partitioned/data/" +
        "00000-0-b0f98903-6d21-45fd-9e0b-afbd4963e365-0-00001.parquet")
      assert(f.fileFormat == "PARQUET")
      assert(f.partition.isEmpty)
      assert(f.recordCount == 4 && f.fileSizeInBytes == 1344)
      assert(f.columnSizes == Map(1 -> 56L, 2 -> 73L, 3 -> 66L, 4 -> 67L))
      assert(f.valueCounts == Map(1 -> 4L, 2 -> 4L, 3 -> 4L, 4 -> 4L))
      assert(f.nullValueCounts == Map(1 -> 0L, 2 -> 0L, 3 -> 0L, 4 -> 0L))
      assert(f.nanValueCounts == Map(4 -> 0L))
      assert(longOf(f.lowerBounds(1)) == 1L && longOf(f.upperBounds(1)) == 4L)
      assert(strOf(f.lowerBounds(2)) == "record_four")
      assert(strOf(f.upperBounds(2)) == "record_two")
      assert(strOf(f.lowerBounds(3)) == "data_content_1")
      assert(strOf(f.upperBounds(3)) == "data_content_4")
      assert(Conversions.fromBytes(DoubleT, f.lowerBounds(4)) == 123.45)
      assert(Conversions.fromBytes(DoubleT, f.upperBounds(4)) == 456.78)
      assert(f.splitOffsets == Seq(4L))
      assert(f.sortOrderId == Some(0))
      assert(f.firstRowId.isEmpty && f.referencedDataFile.isEmpty)
      assert(f.contentOffset.isEmpty && f.contentSizeInBytes.isEmpty)
    }
    val path = s"$res/2ddf1bc9-830b-4015-aced-c060df36f150-m0.avro"
    val plain = ManifestAvro.readManifest(path, StructT(IndexedSeq.empty))
    assert(plain.size == 1)
    checkEntry(plain.head)
    assert(plain.head.sequenceNumber.isEmpty &&
      plain.head.fileSequenceNumber.isEmpty)

    // MetadataInheritanceTest: reading through a ManifestFile wrapper
    // inherits sequence numbers and the wrapper's spec id
    val wrapper = ManifestFile(
      manifestPath = path, manifestLength = 100, partitionSpecId = 12,
      content = ManifestContent.Data, sequenceNumber = 15,
      addedSnapshotId = 679879563479918846L)
    val inherited = ManifestAvro.readManifest(path, StructT(IndexedSeq.empty),
      Some(wrapper))
    assert(inherited.size == 1)
    checkEntry(inherited.head)
    assert(inherited.head.sequenceNumber == Some(15L))
    assert(inherited.head.fileSequenceNumber == Some(15L))
    assert(inherited.head.specId == 12)
  }

  // ---- metadata JSON: positives ----

  test("every positive metadata JSON parses") {
    val v1 = TableMetadataIO.read(s"$res/TableMetadataV1Valid.json")
    assert(v1.formatVersion == 1)
    val v2 = TableMetadataIO.read(s"$res/TableMetadataV2Valid.json")
    assert(v2.formatVersion == 2 && v2.snapshots.size == 2)
    val v2min = TableMetadataIO.read(s"$res/TableMetadataV2ValidMinimal.json")
    assert(v2min.formatVersion == 2)
    // the reference's V3 fixture actually declares format-version 2
    val v3min = TableMetadataIO.read(s"$res/TableMetadataV3ValidMinimal.json")
    assert(v3min.currentSchema.fields.map(_.name) == Seq("x", "y", "z"))
    val stats = TableMetadataIO.read(s"$res/TableMetadataStatisticsFiles.json")
    assert(stats.statistics.nonEmpty)
    val pstats =
      TableMetadataIO.read(s"$res/TableMetadataPartitionStatisticsFiles.json")
    assert(pstats.partitionStatistics.nonEmpty)
  }

  // ---- metadata JSON: negatives (metadata_serde_test.cc) ----

  test("every negative metadata JSON throws") {
    val negatives = Seq(
      "TableMetadataUnsupportedVersion.json",
      "TableMetadataV1MissingSchemaType.json",
      "TableMetadataV2CurrentSchemaNotFound.json",
      "TableMetadataV2MissingLastPartitionId.json",
      "TableMetadataV2MissingPartitionSpecs.json",
      "TableMetadataV2MissingSchemas.json",
      "TableMetadataV2MissingSortOrder.json")
    negatives.foreach { f =>
      assertThrows[Exception](TableMetadataIO.read(s"$res/$f"))
    }
  }

  // ---- completeness: no resource file escapes this suite ----

  test("resource directory is fully covered — zero skips") {
    import scala.jdk.CollectionConverters._
    val actual = java.nio.file.Files.list(java.nio.file.Paths.get(res))
      .iterator.asScala.map(_.getFileName.toString).toSet
    val covered = Set(
      "snap-7532614258660258098-1-eafd2972-f58e-4185-9237-6378f564787e.avro",
      "snap-4134160420377642835-1-aeffe099-3bac-4011-bc17-5875210d8dc0.avro",
      "snap-7522296285847100621-1-5d690750-8fb4-4cd1-8ae7-85c7b39abe14.avro",
      "snap-7412193043800610213-1-2bccd69e-d642-4816-bba0-261cd9bd0d93.avro",
      "snap-251167482216575399-1-ccb6dbcb-0611-48da-be68-bd506ea63188.avro",
      "56357cd7-391f-4df8-aa24-e7e667da8870-m4.avro",
      "2ddf1bc9-830b-4015-aced-c060df36f150-m0.avro",
      "TableMetadataV1Valid.json",
      "TableMetadataV2Valid.json",
      "TableMetadataV2ValidMinimal.json",
      "TableMetadataV3ValidMinimal.json",
      "TableMetadataStatisticsFiles.json",
      "TableMetadataPartitionStatisticsFiles.json",
      "TableMetadataUnsupportedVersion.json",
      "TableMetadataV1MissingSchemaType.json",
      "TableMetadataV2CurrentSchemaNotFound.json",
      "TableMetadataV2MissingLastPartitionId.json",
      "TableMetadataV2MissingPartitionSpecs.json",
      "TableMetadataV2MissingSchemas.json",
      "TableMetadataV2MissingSortOrder.json")
    assert(actual == covered,
      s"uncovered resources: ${(actual -- covered).toSeq.sorted.mkString(", ")}; " +
        s"stale expectations: ${(covered -- actual).toSeq.sorted.mkString(", ")}")
  }
}
