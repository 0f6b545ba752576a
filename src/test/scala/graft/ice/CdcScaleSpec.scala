package graft.ice

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ice.catalog._
import graft.ice.manifest._
import graft.ice.meta._
import graft.ice.types._

/** Bounded-memory CDC planning (the 100-TB bar): computing which data
  * files a snapshot removed must read only the commit's manifest DELTA
  * — never walk (let alone materialize) the full live file set of two
  * table-sized snapshots on the driver. These specs pin it:
  *
  * 1. A GHOST manifest — present untouched in both the parent and the
  *    child list but pointing at a NONEXISTENT file claiming a million
  *    entries — must never be opened: the diff succeeds (any read
  *    attempt would throw), proving untouched manifests stay unread.
  * 2. Past the distributed-planning threshold, the delta diff runs on
  *    executors and only the removed paths (churn-sized) return.
  * 3. A restricted scan (`restrictFiles`, the CDC cowDel read path)
  *    collects only the restricted entries from planning, not the
  *    snapshot's whole live set. */
class CdcScaleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sfDir = "/root/testdata/sf0.001"

  private def freshTable(name: String): IceTable = {
    val cat = new DirCatalog(
      java.nio.file.Files.createTempDirectory("cdcwh").toString)
    val raw = spark.read.parquet(s"$sfDir/region.parquet")
    IceTable.create(cat, TableIdentifier.parse(s"db.$name"),
      SparkConv.fromSpark(raw.schema))
  }

  private def entry(path: String, status: Int, snapId: Long,
      seq: Long): ManifestEntry =
    ManifestEntry(status, Some(snapId), Some(seq), Some(seq),
      DataFile(FileContent.Data, path, "PARQUET", IndexedSeq.empty,
        recordCount = 10L, fileSizeInBytes = 100L))

  private def writeManifest(t: IceTable, name: String,
      entries: Seq[ManifestEntry], snapId: Long, seq: Long): ManifestFile = {
    val schemaJson = MetaJson.schemaToJson(t.schema).toString
    val specJson = MetaJson.specToJson(PartitionSpec.unpartitioned)
      .get("fields").toString
    ManifestAvro.writeManifest(s"${t.metadataFileDir}/$name.avro",
      entries, StructT(IndexedSeq.empty), 0, snapId, seq,
      schemaJson = schemaJson, specFieldsJson = specJson, formatVersion = 2)
  }

  private def writeList(t: IceTable, name: String, ms: IndexedSeq[ManifestFile],
      snapId: Long, parent: Option[Long], seq: Long): String = {
    val p = s"${t.metadataFileDir}/$name.avro"
    ManifestAvro.writeManifestList(p, ms, snapId, parent, seq,
      formatVersion = 2)
    p
  }

  test("removed-file diff never opens manifests shared by both snapshots") {
    val t = freshTable("ghost")
    // ghost: listed in BOTH snapshots, claims 1M entries, file ABSENT —
    // any attempt to read it throws FileNotFoundException
    val ghost = ManifestFile(
      manifestPath = s"${t.metadataFileDir}/ghost-DOES-NOT-EXIST.avro",
      manifestLength = 64L * 1000000L, partitionSpecId = 0,
      addedSnapshotId = 101L,
      addedFilesCount = Some(1000000), existingFilesCount = Some(0),
      deletedFilesCount = Some(0))
    val mSmall = writeManifest(t, "p-small",
      Seq(entry("/data/a.parquet", ManifestStatus.Added, 101L, 1L),
        entry("/data/b.parquet", ManifestStatus.Added, 101L, 1L)), 101L, 1L)
    val parentList = writeList(t, "snap-101", IndexedSeq(mSmall, ghost),
      101L, None, 1L)
    val parent = Snapshot(101L, None, 1L, 1L, parentList,
      Map("operation" -> "append"), schemaId = Some(0))
    // child rewrote mSmall keeping only b (a was removed), ghost untouched
    val mRewrite = writeManifest(t, "c-rewrite",
      Seq(entry("/data/b.parquet", ManifestStatus.Existing, 101L, 1L)),
      102L, 2L)
    val childList = writeList(t, "snap-102", IndexedSeq(mRewrite, ghost),
      102L, Some(101L), 2L)
    val child = Snapshot(102L, Some(101L), 2L, 2L, childList,
      Map("operation" -> "overwrite", "removed-data-files" -> "1"),
      schemaId = Some(0))
    t.commit(base => base.withSnapshot(parent))
    t.commit(base => base.withSnapshot(child))
    // succeeds ONLY if the ghost manifest is never read
    assert(t.removedDataFilePaths(child) == Set("/data/a.parquet"))
  }

  test("past the threshold the delta diff runs distributed and stays exact") {
    val t = freshTable("bigdiff")
    t.newTransaction(spark)
      .setProperty("graft.plan.distributed-threshold", "1000")
      .commitTransaction()
    val n = 5000
    val all = (0 until n).map(i =>
      entry(f"/data/f$i%05d.parquet", ManifestStatus.Added, 201L, 1L))
    val mOld = writeManifest(t, "p-big", all, 201L, 1L)
    val parentList = writeList(t, "snap-201", IndexedSeq(mOld), 201L, None, 1L)
    val parent = Snapshot(201L, None, 1L, 1L, parentList,
      Map("operation" -> "append"), schemaId = Some(0))
    // the child's rewrite drops every 100th file
    val surviving = all.zipWithIndex.collect { case (e, i) if i % 100 != 0 =>
      e.copy(status = ManifestStatus.Existing) }
    val mNew = writeManifest(t, "c-big", surviving, 202L, 2L)
    val childList = writeList(t, "snap-202", IndexedSeq(mNew),
      202L, Some(201L), 2L)
    val child = Snapshot(202L, Some(201L), 2L, 2L, childList,
      Map("operation" -> "overwrite", "removed-data-files" -> "50"),
      schemaId = Some(0))
    t.commit(base => base.withSnapshot(parent))
    t.commit(base => base.withSnapshot(child))
    val removed = t.removedDataFilePaths(child)
    val expected = (0 until n by 100).map(i => f"/data/f$i%05d.parquet").toSet
    assert(removed == expected)
  }

  test("restrictFiles rides into distributed planning: churn-sized collect") {
    val t = freshTable("restrict")
    t.newTransaction(spark)
      .setProperty("graft.plan.distributed-threshold", "1000")
      .commitTransaction()
    val n = 20000
    val all = (0 until n).map(i =>
      entry(f"/data/r$i%05d.parquet", ManifestStatus.Added, 301L, 1L))
    val m = writeManifest(t, "p-restrict", all, 301L, 1L)
    val list = writeList(t, "snap-301", IndexedSeq(m), 301L, None, 1L)
    val snap = Snapshot(301L, None, 1L, 1L, list,
      Map("operation" -> "append"), schemaId = Some(0))
    t.commit(base => base.withSnapshot(snap))
    val want = Set("/data/r00007.parquet", "/data/r19999.parquet")
    // planEntries applies the path restriction executor-side: only the
    // restricted entries are collected (correctness pin; the memory
    // claim is structural — the filter runs before the collect)
    val got = t.planEntries(snap, None, Some(want))
      .map(_.dataFile.filePath).toSet
    assert(got == want)
    val tasks = t.newScan().useSnapshot(301L).restrictFiles(want).planFiles()
    assert(tasks.map(_.file.filePath).toSet == want)
  }
}
