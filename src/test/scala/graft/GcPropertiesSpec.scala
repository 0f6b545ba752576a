package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ice._
import graft.ice.catalog._
import graft.ice.types.SparkConv

/** `gc.enabled` + `history.expire.*` table-property defaults (reference
  * table_properties.h:246-253): gc.enabled=false refuses every physical
  * deletion path (expire, orphan sweep, delete-after-commit); the
  * history.expire keys drive the no-argument expireSnapshots(). */
class GcPropertiesSpec extends AnyFunSuite with BeforeAndAfterAll {

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
    java.nio.file.Files.createTempDirectory("whgc").toString
  private def cat = new DirCatalog(warehouse)

  test("gc.enabled=false refuses expire, orphan sweep, and delete-after-commit") {
    val df = spark.range(0, 20).selectExpr("id")
    val t = IceTable.create(cat, TableIdentifier.parse("db.nogc"),
      SparkConv.fromSpark(df.schema),
      properties = Map(
        "gc.enabled" -> "false",
        "write.metadata.delete-after-commit.enabled" -> "true",
        "write.metadata.previous-versions-max" -> "1"))
    t.append(spark).appendDataFrame(df)
    t.append(spark).appendDataFrame(df)
    t.append(spark).appendDataFrame(df)

    intercept[IllegalArgumentException] {
      t.manageSnapshots().expireSnapshots(System.currentTimeMillis(), 1)
    }
    intercept[IllegalArgumentException] {
      t.maintenance().removeOrphanFiles(System.currentTimeMillis())
    }
    // delete-after-commit trims the metadata LOG but must not have
    // physically deleted the superseded metadata JSONs
    import scala.jdk.CollectionConverters._
    val metaJsons = java.nio.file.Files
      .list(java.nio.file.Paths.get(warehouse, "db", "nogc", "metadata"))
      .iterator.asScala.count(_.toString.endsWith(".metadata.json"))
    assert(metaJsons == 4, // create + 3 appends, none removed
      s"gc.enabled=false must keep every metadata version, found $metaJsons")
  }

  test("history.expire.* drive the no-argument expireSnapshots()") {
    val df = spark.range(0, 10).selectExpr("id")
    val t = IceTable.create(cat, TableIdentifier.parse("db.hexp"),
      SparkConv.fromSpark(df.schema),
      properties = Map(
        // everything is older than a 0ms horizon except the floor
        "history.expire.max-snapshot-age-ms" -> "0",
        "history.expire.min-snapshots-to-keep" -> "2"))
    t.append(spark).appendDataFrame(df)
    t.append(spark).appendDataFrame(df)
    t.append(spark).appendDataFrame(df)
    t.append(spark).appendDataFrame(df)
    assert(t.snapshots.size == 4)
    // an old tag under a table-level ref-age policy of 0 must expire too
    t.manageSnapshots().createTag("old-tag", t.snapshots.head.snapshotId)
    t.commit(b => b.copy(properties =
      b.properties + ("history.expire.max-ref-age-ms" -> "0")))
    Thread.sleep(5)
    t.manageSnapshots().expireSnapshots()
    assert(t.snapshots.size == 2,
      s"min-snapshots-to-keep=2 must keep exactly 2, got ${t.snapshots.size}")
    assert(!t.metadata.refs.contains("old-tag"),
      "table-level max-ref-age-ms must expire the aged tag")
    assert(t.newScan().toDF(spark).count() == 40L)
  }
}
