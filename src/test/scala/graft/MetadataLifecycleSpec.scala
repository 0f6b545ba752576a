package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ice._
import graft.ice.catalog._
import graft.ice.meta._
import graft.ice.types._

/** The three metadata-FILE lifecycle properties the reference declares
  * (table_properties.h:222-231): delete-after-commit, compression-codec,
  * and a custom metadata path. */
class MetadataLifecycleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmpWarehouse(): String =
    java.nio.file.Files.createTempDirectory("warehouse").toString

  private val sfDir = "/root/testdata/sf0.001"

  private def metadataJsons(dir: java.nio.file.Path): Seq[String] =
    if (!Files.isDirectory(dir)) Nil
    else Files.list(dir).iterator.asScala.map(_.getFileName.toString)
      .filter(n => n.startsWith("v") && n.endsWith(".metadata.json"))
      .toSeq.sorted

  test("write.metadata.delete-after-commit.enabled deletes trimmed " +
      "metadata files; disabled keeps them") {
    val raw = spark.read.parquet(s"$sfDir/region.parquet")
    val schema = SparkConv.fromSpark(raw.schema)
    for (enabled <- Seq(true, false)) {
      val wh = tmpWarehouse()
      val cat = new DirCatalog(wh)
      val t = IceTable.create(cat, TableIdentifier.parse("db.t"), schema,
        properties = Map(
          "write.metadata.previous-versions-max" -> "2",
          "write.metadata.delete-after-commit.enabled" -> enabled.toString))
      // 6 commits -> versions 2..7; with max=2 the log keeps only the
      // last 2 previous files, so v1..v4 fall off by the final commit
      (1 to 6).foreach(_ => t.append(spark).appendDataFrame(raw))
      val mdDir = Paths.get(wh, "db", "t", "metadata")
      val present = metadataJsons(mdDir)
      val loaded = IceTable.load(cat, TableIdentifier.parse("db.t"))
      assert(loaded.metadata.metadataLog.size == 2,
        s"log must be trimmed to 2: ${loaded.metadata.metadataLog}")
      if (enabled) {
        // only the current file + the 2 logged previous versions remain
        assert(present == Seq("v5.metadata.json", "v6.metadata.json",
          "v7.metadata.json"), s"expected trimmed files deleted: $present")
      } else {
        assert(present.size == 7, s"disabled must keep all versions: $present")
      }
      // the table still loads and scans whole either way
      assert(loaded.newScan().toDF(spark).count() == raw.count() * 6)
      // and time travel over the KEPT metadata-log entries still works
      val prev = TableMetadataIO.read(loaded.metadata.metadataLog.last.metadataFile)
      assert(prev.snapshots.size == loaded.metadata.snapshots.size - 1)
    }
  }

  test("write.metadata.compression-codec=gzip round-trips and serves " +
      "through catalog load") {
    val wh = tmpWarehouse()
    val cat = new DirCatalog(wh)
    val raw = spark.read.parquet(s"$sfDir/nation.parquet")
    val schema = SparkConv.fromSpark(raw.schema)
    val t = IceTable.create(cat, TableIdentifier.parse("db.gz"), schema,
      properties = Map("write.metadata.compression-codec" -> "gzip"))
    t.append(spark).appendDataFrame(raw)
    // the file on disk is really gzip (magic bytes), not plain JSON
    val v2 = Paths.get(wh, "db", "gz", "metadata", "v2.metadata.json")
    val head = Files.readAllBytes(v2).take(2).map(_ & 0xff)
    assert(head.sameElements(Array(0x1f, 0x8b)), s"not gzip: ${head.toSeq}")
    // read back equal through the sniffing reader
    val loaded = IceTable.load(cat, TableIdentifier.parse("db.gz"))
    assert(loaded.metadata.properties(
      "write.metadata.compression-codec") == "gzip")
    assert(loaded.newScan().toDF(spark).count() == raw.count())
    // encode/decode round trip is exact
    val decoded = TableMetadataIO.read(v2.toString)
    assert(MetaJson.toJson(decoded) == MetaJson.toJson(loaded.metadata))
    // a table that never set the property still writes plain JSON
    val plain = IceTable.create(cat, TableIdentifier.parse("db.plainmd"), schema)
    plain.append(spark).appendDataFrame(raw)
    val p2 = Paths.get(wh, "db", "plainmd", "metadata", "v2.metadata.json")
    assert(Files.readAllBytes(p2)(0) == '{'.toByte)
  }

  test("gzip metadata serves unchanged through the REST catalog") {
    val wh = tmpWarehouse()
    val backing = new DirCatalog(wh)
    val raw = spark.read.parquet(s"$sfDir/region.parquet")
    val schema = SparkConv.fromSpark(raw.schema)
    val t = IceTable.create(backing, TableIdentifier.parse("db.gzrest"), schema,
      properties = Map("write.metadata.compression-codec" -> "gzip"))
    t.append(spark).appendDataFrame(raw)
    val server = new RestCatalogServer(backing)
    try {
      val rest = new RestCatalog(server.baseUrl)
      val ref = rest.loadTable(TableIdentifier.parse("db.gzrest"))
      assert(MetaJson.toJson(ref.metadata) == MetaJson.toJson(
        IceTable.load(backing, TableIdentifier.parse("db.gzrest")).metadata))
      // and a commit THROUGH the rest catalog keeps writing gzip
      IceTable.from(ref).append(spark).appendDataFrame(raw)
      val v3 = Paths.get(wh, "db", "gzrest", "metadata", "v3.metadata.json")
      val head = Files.readAllBytes(v3).take(2).map(_ & 0xff)
      assert(head.sameElements(Array(0x1f, 0x8b)), "REST commit lost the codec")
    } finally server.stop()
  }

  test("write.metadata.path: split data/metadata roots — scans, time " +
      "travel, and removeOrphanFiles respect it") {
    val wh = tmpWarehouse()
    val mdRoot = Files.createTempDirectory("custom-metadata").toString
    val cat = new DirCatalog(wh)
    val raw = spark.read.parquet(s"$sfDir/region.parquet")
    val schema = SparkConv.fromSpark(raw.schema)
    val ident = TableIdentifier.parse("db.split")
    val t = IceTable.create(cat, ident, schema,
      properties = Map("write.metadata.path" -> mdRoot))
    val s1 = t.append(spark).appendDataFrame(raw)
    t.append(spark).appendDataFrame(raw)

    // version files live under the custom root, not the default dir
    assert(metadataJsons(Paths.get(mdRoot)) ==
      Seq("v1.metadata.json", "v2.metadata.json", "v3.metadata.json"))
    assert(metadataJsons(Paths.get(wh, "db", "split", "metadata")).isEmpty)
    // the default dir keeps the catalog pointers
    assert(Files.exists(Paths.get(wh, "db", "split", "metadata",
      "metadata-path.text")))

    // fresh catalog instance resolves the table fully (scan + count)
    val loaded = IceTable.load(new DirCatalog(wh), ident)
    assert(loaded.newScan().toDF(spark).count() == raw.count() * 2)
    // time travel to the first snapshot
    assert(loaded.newScan().useSnapshot(s1.snapshotId).toDF(spark).count()
      == raw.count())

    // removeOrphanFiles must not touch the custom-path metadata files
    val removed = loaded.maintenance().removeOrphanFiles(
      olderThanMs = System.currentTimeMillis() + 1000)
    assert(removed.forall(!_.endsWith(".metadata.json")),
      s"orphan sweep deleted metadata: $removed")
    assert(metadataJsons(Paths.get(mdRoot)).size == 3)
    assert(IceTable.load(new DirCatalog(wh), ident)
      .newScan().toDF(spark).count() == raw.count() * 2)

    // purge drop removes the custom metadata dir too
    assert(new DirCatalog(wh).dropTable(ident, purge = true))
    assert(metadataJsons(Paths.get(mdRoot)).isEmpty)
  }

  test("write.metadata.path set mid-life: new versions move, old resolve") {
    val wh = tmpWarehouse()
    val mdRoot = Files.createTempDirectory("custom-metadata2").toString
    val cat = new DirCatalog(wh)
    val raw = spark.read.parquet(s"$sfDir/region.parquet")
    val schema = SparkConv.fromSpark(raw.schema)
    val ident = TableIdentifier.parse("db.move")
    val t = IceTable.create(cat, ident, schema)
    t.append(spark).appendDataFrame(raw) // v2 in the default dir
    t.commit(m => m.copy(properties =
      m.properties + ("write.metadata.path" -> mdRoot))) // v3 moves
    t.append(spark).appendDataFrame(raw) // v4 under the custom root
    assert(metadataJsons(Paths.get(wh, "db", "move", "metadata")) ==
      Seq("v1.metadata.json", "v2.metadata.json"))
    assert(metadataJsons(Paths.get(mdRoot)) ==
      Seq("v3.metadata.json", "v4.metadata.json"))
    val freshCat = new DirCatalog(wh)
    assert(freshCat.currentVersion(ident) == 4)
    val loaded = IceTable.load(freshCat, ident)
    assert(loaded.newScan().toDF(spark).count() == raw.count() * 2)
  }
}
