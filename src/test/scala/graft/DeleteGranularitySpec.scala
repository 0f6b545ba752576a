package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ice._
import graft.ice.catalog._
import graft.ice.expr.{Expr => E}
import graft.ice.manifest.{FileContent, ManifestAvro}
import graft.ice.meta.{PartitionField, PartitionSpec}
import graft.ice.transform.IdentityTransform
import graft.ice.types.SparkConv

/** `write.delete.granularity` + `write.delete.target-file-size-bytes`
  * (reference table_properties.h:243,257): partition granularity pins one
  * position-delete file per touched partition, file granularity one per
  * referenced data file (path bounds prove it), and the target size
  * rolls oversized delete planes. */
class DeleteGranularitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("whdg").toString
  private def cat = new DirCatalog(warehouse)

  private def mkTable(name: String, props: Map[String, String]): IceTable = {
    val raw = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val schema = SparkConv.fromSpark(raw.schema)
    val statusId = schema.findFieldByName("o_orderstatus").get.id
    val spec = PartitionSpec(0, IndexedSeq(
      PartitionField(statusId, 1000, "o_orderstatus", IdentityTransform)))
    val t = IceTable.create(cat, TableIdentifier.parse(s"db.$name"), schema,
      spec, properties = props ++ Map("write.delete.mode" -> "merge-on-read"))
    t.append(spark).appendDataFrame(raw)
    t
  }

  private def posDeleteEntries(t: IceTable) =
    t.planDeleteEntries(t.currentSnapshot.get)
      .filter(e => e.dataFile.content == FileContent.PositionDeletes)

  test("partition granularity (the default) writes one delete file per touched partition") {
    val t = mkTable("dg_part", Map.empty)
    val statuses = t.newScan().toDF(spark)
      .select("o_orderstatus").distinct().collect().map(_.getString(0)).sorted
    assert(statuses.length >= 2, "fixture needs >=2 partitions")
    // a delete touching EVERY partition (modulo spread over all statuses)
    t.delete(spark).deleteWherePositional(E.raw("o_orderkey % 3 = 0"))
    val dels = posDeleteEntries(t)
    assert(dels.size == statuses.length,
      s"want one delete file per partition (${statuses.length}), got ${dels.size}")
    // each delete file's data lives under its partition's group: its path
    // bounds must span only data files of ONE partition directory
    dels.foreach { e =>
      val lo = new String(e.dataFile.lowerBounds(
        graft.ice.write.RowDelete.PathBoundFieldId),
        java.nio.charset.StandardCharsets.UTF_8)
      val hi = new String(e.dataFile.upperBounds(
        graft.ice.write.RowDelete.PathBoundFieldId),
        java.nio.charset.StandardCharsets.UTF_8)
      def partDir(p: String) = p.split('/').find(_.startsWith("__gp_o_orderstatus="))
      assert(partDir(lo).isDefined && partDir(lo) == partDir(hi),
        s"delete file spans partitions: $lo .. $hi")
    }
    // correctness through the scan
    assert(t.newScan().toDF(spark).count() ==
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .filter("o_orderkey % 3 != 0").count())
  }

  test("file granularity writes one delete file per referenced data file") {
    val t = mkTable("dg_file", Map("write.delete.granularity" -> "file"))
    val nData = t.newScan().planFiles().size
    assert(nData >= 2)
    t.delete(spark).deleteWherePositional(E.raw("o_orderkey % 2 = 0"))
    val dels = posDeleteEntries(t)
    assert(dels.size == nData,
      s"want one delete file per data file ($nData), got ${dels.size}")
    // path bounds prove single-file scope: lower == upper for every one
    dels.foreach { e =>
      assert(java.util.Arrays.equals(
        e.dataFile.lowerBounds(graft.ice.write.RowDelete.PathBoundFieldId),
        e.dataFile.upperBounds(graft.ice.write.RowDelete.PathBoundFieldId)),
        "file-granularity delete file references more than one data file")
    }
    assert(t.newScan().toDF(spark).count() ==
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .filter("o_orderkey % 2 != 0").count())
  }

  test("delete target file size rolls oversized delete planes") {
    // tiny record budget: ~128-byte rows against a 4 KiB target
    val t = mkTable("dg_roll",
      Map("write.delete.target-file-size-bytes" -> "4096"))
    t.delete(spark).deleteWherePositional(E.raw("o_orderkey % 2 = 0"))
    val dels = posDeleteEntries(t)
    val cap = 4096 / 8 // loosest possible reading of the estimator
    assert(dels.forall(_.dataFile.recordCount <= cap),
      s"rolling cap breached: ${dels.map(_.dataFile.recordCount)}")
    val statuses = t.newScan().toDF(spark)
      .select("o_orderstatus").distinct().count()
    assert(dels.size > statuses,
      "a 4 KiB target over thousands of deletes must roll multiple files per partition")
    assert(t.newScan().toDF(spark).count() ==
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .filter("o_orderkey % 2 != 0").count())
  }

  test("file granularity survives realistic-length warehouse paths") {
    // a ~180-char table location: encoding the raw data-file path into
    // the partitionBy directory name (URL-escaped, ~3x) used to exceed
    // the filesystem's 255-byte filename limit; the digest grouping
    // must not care how long paths get
    var deep = java.nio.file.Paths.get(warehouse)
    (1 to 6).foreach { i =>
      deep = deep.resolve("a-realistically-named-warehouse-segment-" + i)
    }
    java.nio.file.Files.createDirectories(deep)
    val raw = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    cat.createTable(TableIdentifier.parse("db.dg_longpath"),
      SparkConv.fromSpark(raw.schema),
      properties = Map("write.delete.mode" -> "merge-on-read",
        "write.delete.granularity" -> "file"),
      location = Some(deep.resolve("dg_longpath").toString))
    val t = IceTable.load(cat, TableIdentifier.parse("db.dg_longpath"))
    t.append(spark).appendDataFrame(raw)
    val nData = t.newScan().planFiles().size
    t.delete(spark).deleteWherePositional(E.raw("o_orderkey % 2 = 0"))
    val dels = posDeleteEntries(t)
    assert(dels.size == nData)
    dels.foreach { e =>
      assert(java.util.Arrays.equals(
        e.dataFile.lowerBounds(graft.ice.write.RowDelete.PathBoundFieldId),
        e.dataFile.upperBounds(graft.ice.write.RowDelete.PathBoundFieldId)))
    }
    assert(t.newScan().toDF(spark).count() == raw.filter("o_orderkey % 2 != 0").count())
  }
}
