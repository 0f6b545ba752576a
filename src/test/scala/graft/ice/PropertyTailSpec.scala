package graft.ice

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ice.catalog._
import graft.ice.meta.TableProperties
import graft.ice.types.SparkConv

/** The declared-registry tail (reference table_properties.h): reader
  * vectorization knobs, metadata-plane split sizing, the table-level
  * upsert default, and the reserved_properties() refusal. */
class PropertyTailSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("whpt").toString

  private lazy val spark = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.catalog.ice", "graft.ice.connector.GraftCatalogPlugin")
      .config("spark.sql.catalog.ice.warehouse", warehouse)
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

  private def cat = new DirCatalog(warehouse)
  private def raw = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  // ---- read.{parquet,orc}.vectorization.* ----

  test("vectorization properties reach the Spark reader config on path scans") {
    val t = IceTable.create(cat, TableIdentifier.parse("db.pt_vec"),
      SparkConv.fromSpark(raw.schema), properties = Map(
        "read.parquet.vectorization.batch-size" -> "1111",
        "read.parquet.vectorization.enabled" -> "true"))
    t.append(spark).appendDataFrame(raw)
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "4096")
    assert(t.newScan().toDF(spark).count() == raw.count())
    assert(spark.conf.get("spark.sql.parquet.columnarReaderBatchSize") == "1111",
      "batch-size property must reach the parquet reader configuration")
    assert(spark.conf.get("spark.sql.parquet.enableVectorizedReader") == "true")
  }

  test("disabled vectorization is honored (row-at-a-time read, same rows)") {
    val t = IceTable.create(cat, TableIdentifier.parse("db.pt_novec"),
      SparkConv.fromSpark(raw.schema), properties = Map(
        "read.parquet.vectorization.enabled" -> "false"))
    t.append(spark).appendDataFrame(raw)
    assert(t.newScan().toDF(spark).count() == raw.count())
    assert(spark.conf.get("spark.sql.parquet.enableVectorizedReader") == "false")
    // restore: other specs in this JVM expect the default
    spark.conf.set("spark.sql.parquet.enableVectorizedReader", "true")
  }

  test("connector scan applies vectorization overrides and restores the session") {
    val t = IceTable.create(cat, TableIdentifier.parse("db.pt_conn"),
      SparkConv.fromSpark(raw.schema), properties = Map(
        "read.parquet.vectorization.batch-size" -> "777",
        "read.parquet.vectorization.enabled" -> "false"))
    t.append(spark).appendDataFrame(raw)
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "4096")
    spark.conf.set("spark.sql.parquet.enableVectorizedReader", "true")
    assert(spark.sql("SELECT count(*) FROM ice.db.pt_conn").head.getLong(0) ==
      raw.count())
    // the overrides were applied around the reader build, then restored
    assert(spark.conf.get("spark.sql.parquet.columnarReaderBatchSize") == "4096",
      "connector must not leak a table's batch size into the session")
    assert(spark.conf.get("spark.sql.parquet.enableVectorizedReader") == "true")
  }

  test("a bad vectorization value fails loudly at scan time") {
    val t = IceTable.create(cat, TableIdentifier.parse("db.pt_badvec"),
      SparkConv.fromSpark(raw.schema), properties = Map(
        "read.parquet.vectorization.batch-size" -> "lots"))
    t.append(spark).appendDataFrame(raw)
    intercept[NumberFormatException] { t.newScan().toDF(spark) }
  }

  // ---- read.split.metadata-target-size ----

  test("metadata byte-binning: order-preserving, target-bounded, overflow-safe") {
    val items = (1 to 100).map(i => (s"m$i", 1024L * 1024))
    // 10 MiB target over 100 x 1 MiB manifests -> 10 bins of 10
    val bins = IceTable.binBySize[(String, Long)](items, _._2, 10L * 1024 * 1024)
    assert(bins.size == 10 && bins.forall(_.size == 10))
    assert(bins.flatten == items, "binning must preserve planning order")
    // an item larger than the target rides alone
    val mixed = Seq(("big", 64L * 1024 * 1024)) ++ items.take(3)
    val mixedBins = IceTable.binBySize[(String, Long)](mixed, _._2, 4L * 1024 * 1024)
    assert(mixedBins.head == Seq(("big", 64L * 1024 * 1024)))
    // Long.MaxValue target must not overflow into per-item bins
    assert(IceTable.binBySize[(String, Long)](items, _._2, Long.MaxValue).size == 1)
  }

  test("metadata-target-size changes task shape, never planning results") {
    val t = IceTable.create(cat, TableIdentifier.parse("db.pt_meta"),
      SparkConv.fromSpark(raw.schema), properties = Map(
        "read.data-planning-mode" -> "distributed"))
    // several commits -> several manifests
    raw.limit(3000).randomSplit(Array(1, 1, 1)).foreach(part =>
      t.append(spark).appendDataFrame(part))
    def planned(target: String): Seq[String] = {
      t.commit(b => b.copy(properties = b.properties +
        ("read.split.metadata-target-size" -> target)))
      t.newScan().planFiles().map(_.file.filePath).sorted
    }
    val tiny = planned("1024")
    val huge = planned((64L * 1024 * 1024).toString)
    assert(tiny.nonEmpty && tiny == huge,
      "planning results must be bit-equal across metadata split targets")
  }

  // ---- write.upsert.enabled ----

  test("write.upsert.enabled routes appends through keyed MoR upsert") {
    val schema0 = SparkConv.fromSpark(
      spark.range(0, 0).selectExpr("id", "CAST(id AS STRING) AS v").schema)
    val keyId = schema0.findFieldByName("id").get.id
    val schema = schema0.copy(identifierFieldIds = Seq(keyId))
    val t = IceTable.create(cat, TableIdentifier.parse("db.pt_upsert"), schema,
      properties = Map("write.upsert.enabled" -> "true"))
    t.append(spark).appendDataFrame(
      spark.range(0, 100).selectExpr("id", "CAST(id AS STRING) AS v"))
    // second append overlaps keys 50..99 with new values, adds 100..119
    t.append(spark).appendDataFrame(
      spark.range(50, 120).selectExpr("id", "concat('new-', id) AS v"))
    val out = t.newScan().toDF(spark)
    assert(out.count() == 120L, "upsert must never duplicate keys")
    assert(out.groupBy("id").count().filter("count > 1").count() == 0L)
    assert(out.filter("id = 75 AND v = 'new-75'").count() == 1L,
      "overlapping keys take the new row's values")
    assert(out.filter("id = 10 AND v = '10'").count() == 1L)
    // the upsert is merge-on-read: the seed file was not rewritten
    assert(t.planDeleteEntries(t.currentSnapshot.get).nonEmpty,
      "table-default upsert must go through the MoR delete plane")
  }

  test("write.upsert.enabled without identifier fields fails loudly") {
    val t = IceTable.create(cat, TableIdentifier.parse("db.pt_upsert_nokey"),
      SparkConv.fromSpark(raw.schema),
      properties = Map("write.upsert.enabled" -> "true"))
    // a keyless upsert table refuses on the very first write — silently
    // appending would betray the table's declared upsert contract
    val e = intercept[IllegalArgumentException] {
      t.append(spark).appendDataFrame(raw.limit(10))
    }
    assert(e.getMessage.contains("identifier"))
  }

  // ---- reserved_properties() ----

  test("reserved property keys refuse on create, commit, and REST") {
    val schema = SparkConv.fromSpark(raw.schema)
    val e1 = intercept[IllegalArgumentException] {
      IceTable.create(cat, TableIdentifier.parse("db.pt_resv"), schema,
        properties = Map("uuid" -> "impostor"))
    }
    assert(e1.getMessage.contains("reserved"))

    val t = IceTable.create(cat, TableIdentifier.parse("db.pt_resv2"), schema)
    for (k <- Seq("uuid", "snapshot-count", "current-snapshot-id",
        "current-schema", "default-partition-spec", "default-sort-order",
        "current-snapshot-summary", "current-snapshot-timestamp",
        "format-version")) {
      val e = intercept[IllegalArgumentException] {
        t.commit(b => b.copy(properties = b.properties + (k -> "x")))
      }
      assert(e.getMessage.contains("reserved"), s"$k must refuse: ${e.getMessage}")
    }
    // ordinary properties still commit
    t.commit(b => b.copy(properties = b.properties + ("owner" -> "me")))
    assert(t.properties("owner") == "me")

    // the REST update path enforces independently of IceTable
    val e2 = intercept[IllegalArgumentException] {
      RestJson.applyUpdates(t.metadata,
        Seq(RestJson.SetProperties(Map("uuid" -> "impostor"))))
    }
    assert(e2.getMessage.contains("reserved"))
    val e3 = intercept[IllegalArgumentException] {
      RestJson.applyUpdates(t.metadata,
        Seq(RestJson.RemoveProperties(Seq("current-snapshot-id"))))
    }
    assert(e3.getMessage.contains("reserved"))

    // format-version stays legitimate at CREATE (consumed, not stored)
    val t3 = IceTable.create(cat, TableIdentifier.parse("db.pt_resv3"), schema,
      properties = Map("format-version" -> "3"))
    assert(t3.metadata.formatVersion == 3)
    assert(!t3.properties.contains("format-version"))
  }
}
