package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ice._
import graft.ice.catalog._
import graft.ice.expr.{Expr => E}
import graft.ice.manifest._
import graft.ice.meta._
import graft.ice.transform._
import graft.ice.types._

/** Round-4 regression coverage for the latent bugs the round-3 audit
  * flagged: manifest-merge vs incremental scans, `_spec_id` threading,
  * duplicate `_deleted` marking, compaction output sizing, and orphan
  * sweeps vs statistics files. */
class MergeAndMarkSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sfDir = "/root/testdata/sf0.001"

  test("manifest merge keeps the committing snapshot's entries Added (incremental scan survives)") {
    val cat = new DirCatalog(java.nio.file.Files.createTempDirectory("wh").toString)
    val raw = spark.read.parquet(s"$sfDir/orders.parquet")
    val schema = SparkConv.fromSpark(raw.schema)
    // low threshold so the merge path triggers within a handful of commits
    // (same code path as the default 100 — just reachable in test time)
    val t = IceTable.create(cat, TableIdentifier.parse("db.merge_inc"), schema,
      properties = Map("commit.manifest.min-count-to-merge" -> "4"))
    val slices = (0 until 10).map(i => raw.filter(col("o_orderkey") % 10 === i))
    val snaps = slices.map(s => t.append(spark).appendDataFrame(s))

    // the merge actually fired: final manifest list is smaller than the
    // number of commits
    val manifests = ManifestAvro.readManifestList(t.currentSnapshot.get.manifestList)
    assert(manifests.size < snaps.size, s"merge never fired: ${manifests.size}")

    // every post-merge incremental window still sees exactly its append
    for (i <- 1 until snaps.size) {
      val entries = t.planAppendsBetween(snaps(i - 1).snapshotId, snaps(i).snapshotId)
      val got = entries.map(_.dataFile.recordCount).sum
      val want = slices(i).count()
      assert(got == want, s"appendsBetween(${i - 1}, $i): $got != $want")
    }
    // and a full scan still sees every row exactly once
    assert(t.newScan().toDF(spark).count() == raw.count())
  }

  test("_spec_id metadata column reflects each file's actual partition spec") {
    val cat = new DirCatalog(java.nio.file.Files.createTempDirectory("wh").toString)
    val raw = spark.read.parquet(s"$sfDir/orders.parquet")
    val schema = SparkConv.fromSpark(raw.schema)
    val t = IceTable.create(cat, TableIdentifier.parse("db.specid"), schema)
    t.append(spark).appendDataFrame(raw.filter("o_orderkey % 2 = 0"))
    t.updateSpec().addField("order_year", "o_orderdate", YearTransform).commit()
    t.append(spark).appendDataFrame(raw.filter("o_orderkey % 2 = 1"))

    val df = t.newScan().withMetadataColumns("_spec_id").toDF(spark)
    val bySpec = df.groupBy("_spec_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(bySpec.keySet == Set(0, 1), s"spec ids seen: ${bySpec.keySet}")
    assert(bySpec(0) == raw.filter("o_orderkey % 2 = 0").count())
    assert(bySpec(1) == raw.filter("o_orderkey % 2 = 1").count())
  }

  test("overlapping position deletes mark rows once, not once per delete file") {
    val cat = new DirCatalog(java.nio.file.Files.createTempDirectory("wh").toString)
    val raw = spark.read.parquet(s"$sfDir/orders.parquet")
    val schema = SparkConv.fromSpark(raw.schema)
    val t = IceTable.create(cat, TableIdentifier.parse("db.overlap"), schema)
    t.append(spark).appendDataFrame(raw)
    // both predicates cover o_orderkey < 1000: those (file,pos) tuples
    // appear in BOTH delete files
    t.delete(spark).deleteWherePositional(E.lt("o_orderkey", Literal.long(1000)))
    t.delete(spark).deleteWherePositional(E.lt("o_orderkey", Literal.long(2000)))

    val marked = t.newScan().withMetadataColumns("_deleted").toDF(spark)
    assert(marked.count() == raw.count(),
      "marking mode must keep exactly one copy of every row")
    assert(marked.filter(col("_deleted")).count() ==
      raw.filter("o_orderkey < 2000").count())
    // filtering mode agrees
    assert(t.newScan().toDF(spark).count() ==
      raw.filter("o_orderkey >= 2000").count())
  }

  test("delete-scoped compaction sizes output from the rewritten subset, not the table") {
    val cat = new DirCatalog(java.nio.file.Files.createTempDirectory("wh").toString)
    val raw = spark.read.parquet(s"$sfDir/orders.parquet")
    val schema = SparkConv.fromSpark(raw.schema)
    val t = IceTable.create(cat, TableIdentifier.parse("db.sizing"), schema)
    // two files with disjoint key ranges; the delete touches only the
    // first (keys span 0..1499 in this testdata — split mid-range; a
    // split past the max would leave an empty second append, which the
    // writer no longer registers)
    t.append(spark).appendDataFrame(raw.filter("o_orderkey < 700").coalesce(1))
    t.append(spark).appendDataFrame(raw.filter("o_orderkey >= 700").coalesce(1))
    t.delete(spark).deleteWherePositional(E.lt("o_orderkey", Literal.long(100)))
    val expected = t.newScan().toDF(spark).count()
    val files = t.newScan().planFiles()
    assert(files.size == 2)
    // target = the larger file's size: sizing from the SUBSET (one file)
    // yields exactly 1 replacement file; sizing from the whole table
    // (both files) would yield 2
    val touched = files.map(_.file.fileSizeInBytes).max
    t.compact(spark).rewriteDataFiles(
      targetFileSizeBytes = touched, smallFileThreshold = 1)
    val after = t.newScan().planFiles()
    assert(t.newScan().toDF(spark).count() == expected)
    assert(after.size == 2,
      s"subset rewrite should produce exactly 1 replacement file (2 total), got ${after.size}")
  }

  test("transaction: append + setProperty commit atomically under a concurrent committer") {
    val cat = new DirCatalog(java.nio.file.Files.createTempDirectory("wh").toString)
    val raw = spark.read.parquet(s"$sfDir/orders.parquet")
    val schema = SparkConv.fromSpark(raw.schema)
    val ident = TableIdentifier.parse("db.txn")
    val t = IceTable.create(cat, ident, schema)
    t.append(spark).appendDataFrame(raw.limit(100))

    // stage the transaction (files written, nothing visible yet)
    val tx = t.newTransaction(spark)
      .append(raw.limit(50))
      .setProperty("graft.txn-test", "yes")
    assert(!IceTable.load(cat, ident).metadata.properties.contains("graft.txn-test"))

    // a concurrent committer wins the next version before we commit
    val t2 = IceTable.load(cat, ident)
    t2.append(spark).appendDataFrame(raw.limit(30))
    val vAfterConcurrent = cat.loadTable(ident).version

    tx.commitTransaction()
    val fin = cat.loadTable(ident)
    // exactly ONE version bump for the whole transaction
    assert(fin.version == vAfterConcurrent + 1,
      s"expected ${vAfterConcurrent + 1}, got ${fin.version}")
    val tFin = IceTable.from(fin)
    // both effects landed, plus the concurrent append survived the retry
    assert(tFin.metadata.properties.get("graft.txn-test").contains("yes"))
    assert(tFin.newScan().toDF(spark).count() == 180)
    assert(tx.committedSnapshot.isDefined)
  }

  test("transaction: a failed requirement aborts every staged effect") {
    val cat = new DirCatalog(java.nio.file.Files.createTempDirectory("wh").toString)
    val raw = spark.read.parquet(s"$sfDir/region.parquet")
    val schema = SparkConv.fromSpark(raw.schema)
    val ident = TableIdentifier.parse("db.txnfail")
    val t = IceTable.create(cat, ident, schema)
    t.append(spark).appendDataFrame(raw)
    val before = cat.loadTable(ident)

    val tx = t.newTransaction(spark)
      .append(raw.limit(2))
      .setProperty("graft.should-not-land", "x")
      .requirement(AssertTableUuid("not-the-real-uuid"))
    intercept[RequirementFailedException] { tx.commitTransaction() }

    val after = cat.loadTable(ident)
    assert(after.version == before.version) // no version bump
    assert(!after.metadata.properties.contains("graft.should-not-land"))
    assert(IceTable.from(after).newScan().toDF(spark).count() == raw.count())
  }

  test("addFiles stamps field-id presence; planning does not probe footers") {
    val cat = new DirCatalog(java.nio.file.Files.createTempDirectory("wh").toString)
    val raw = spark.read.parquet(s"$sfDir/nation.parquet")
    // external parquet WITHOUT field ids (plain Spark write)
    val ext = java.nio.file.Files.createTempDirectory("ext").toString
    raw.coalesce(1).write.mode("overwrite").parquet(ext)
    val extFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(ext))
      .iterator().asScala.map(_.toString).filter(_.endsWith(".parquet")).toSeq

    val schema = SparkConv.fromSpark(raw.schema)
    val t = IceTable.create(cat, TableIdentifier.parse("db.idsum"), schema)
    val snap = t.append(spark).addFiles(extFiles)
    // registration stamped the summary (these files lack ids)
    assert(snap.summary.get(IceTable.FieldIdsSummaryKey).contains("none"))

    val probesBefore = ScanBuilder.fieldIdProbeCalls.get()
    val df = t.newScan().toDF(spark)
    assert(df.count() == raw.count())
    assert(ScanBuilder.fieldIdProbeCalls.get() == probesBefore,
      "plan/read must resolve id presence from the snapshot summary, not footer probes")
  }

  test("stageCreate: table + data publish in one commit (CTAS), invisible before") {
    val cat = new DirCatalog(java.nio.file.Files.createTempDirectory("wh").toString)
    val raw = spark.read.parquet(s"$sfDir/region.parquet")
    val schema = SparkConv.fromSpark(raw.schema)
    val ident = TableIdentifier.parse("db.staged")

    val ref = cat.buildTable(ident, schema)
      .withProperty("graft.ctas", "yes")
      .stageCreate()
    val (staged, tx) = IceTable.stageCreate(ref, spark)
    tx.append(raw)
    // files are written but the table is NOT visible yet — not even to
    // listTables (no phantom metadata/ directory)
    assert(!cat.tableExists(ident))
    intercept[NoSuchTableException] { cat.loadTable(ident) }
    assert(!cat.listTables(Seq("db")).contains(ident))

    tx.commitTransaction()
    val loaded = IceTable.load(cat, ident)
    assert(cat.loadTable(ident).version == 1) // creation + data = ONE commit
    assert(loaded.metadata.properties.get("graft.ctas").contains("yes"))
    assert(loaded.newScan().toDF(spark).count() == raw.count())
    assert(staged.currentSnapshot.isDefined)
  }

  test("stageCreate: a concurrent create of the same name aborts the staged transaction") {
    val cat = new DirCatalog(java.nio.file.Files.createTempDirectory("wh").toString)
    val raw = spark.read.parquet(s"$sfDir/region.parquet")
    val schema = SparkConv.fromSpark(raw.schema)
    val ident = TableIdentifier.parse("db.race")

    val ref = cat.buildTable(ident, schema).stageCreate()
    val (_, tx) = IceTable.stageCreate(ref, spark)
    tx.append(raw.limit(2))
    // someone else creates (and fills) the table first
    val winner = IceTable.create(cat, ident, schema)
    winner.append(spark).appendDataFrame(raw.limit(3))
    val winnerRows = winner.newScan().toDF(spark).count()

    intercept[RequirementFailedException] { tx.commitTransaction() }
    // the winner's table is untouched
    val fin = IceTable.load(cat, ident)
    assert(fin.metadata.tableUuid == winner.metadata.tableUuid)
    assert(fin.newScan().toDF(spark).count() == winnerRows)
  }

  test("rollbackTo moves main back without deleting the abandoned snapshot") {
    val cat = new DirCatalog(java.nio.file.Files.createTempDirectory("wh").toString)
    val raw = spark.read.parquet(s"$sfDir/orders.parquet")
    val schema = SparkConv.fromSpark(raw.schema)
    val t = IceTable.create(cat, TableIdentifier.parse("db.rb"), schema)
    val s1 = t.append(spark).appendDataFrame(raw.filter("o_orderkey % 2 = 0"))
    val s2 = t.append(spark).appendDataFrame(raw.filter("o_orderkey % 2 = 1"))

    t.manageSnapshots().rollbackTo(s1.snapshotId)
    assert(t.currentSnapshot.map(_.snapshotId).contains(s1.snapshotId))
    assert(t.newScan().toDF(spark).count() == raw.filter("o_orderkey % 2 = 0").count())
    // the abandoned snapshot is still addressable (recovery window)
    assert(t.newScan().useSnapshot(s2.snapshotId).toDF(spark).count() == raw.count())
    // a new append parents off the rolled-back head
    val s3 = t.append(spark).appendDataFrame(raw.limit(7))
    assert(s3.parentSnapshotId.contains(s1.snapshotId))
    // unknown snapshot refuses
    intercept[IllegalArgumentException] { t.manageSnapshots().rollbackTo(12345L) }
  }

  test("removeOrphanFiles keeps statistics and partition-statistics files") {
    val cat = new DirCatalog(java.nio.file.Files.createTempDirectory("wh").toString)
    val raw = spark.read.parquet(s"$sfDir/region.parquet")
    val schema = SparkConv.fromSpark(raw.schema)
    val t = IceTable.create(cat, TableIdentifier.parse("db.orphstats"), schema)
    val snap = t.append(spark).appendDataFrame(raw)
    // register a Puffin statistics file + partition stats file in metadata
    val statsPath = s"${t.metadataFileDir}/stats-${snap.snapshotId}.puffin"
    val pstatsPath = s"${t.metadataFileDir}/pstats-${snap.snapshotId}.parquet"
    java.nio.file.Files.write(java.nio.file.Paths.get(statsPath), "PFA1".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(pstatsPath), "x".getBytes)
    t.commit { base =>
      base.copy(
        statistics = Seq(StatisticsFile(snap.snapshotId, statsPath, 4L, 4L, Nil)),
        partitionStatistics = Seq(PartitionStatisticsFile(snap.snapshotId, pstatsPath, 1L)))
    }
    // a genuine orphan, to prove the sweep still works
    val orphan = s"${t.dataFileDir}/orphan.parquet"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(t.dataFileDir))
    java.nio.file.Files.write(java.nio.file.Paths.get(orphan), "junk".getBytes)

    val deleted = t.maintenance().removeOrphanFiles(olderThanMs = System.currentTimeMillis() + 1000)
    assert(deleted.contains(orphan), s"orphan not swept: $deleted")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(statsPath)),
      "statistics file was deleted by the orphan sweep")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(pstatsPath)),
      "partition statistics file was deleted by the orphan sweep")
  }
}
