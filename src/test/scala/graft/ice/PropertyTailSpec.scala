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

  test("vectorization properties scope to the scan's session — applied " +
      "there, never leaked to the caller's") {
    val t = IceTable.create(cat, TableIdentifier.parse("db.pt_vec"),
      SparkConv.fromSpark(raw.schema), properties = Map(
        "read.parquet.vectorization.batch-size" -> "1111",
        "read.parquet.vectorization.enabled" -> "true"))
    t.append(spark).appendDataFrame(raw)
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "4096")
    val df = t.newScan().toDF(spark)
    // the scan executes under a cloned session carrying the overrides...
    assert(df.sparkSession.conf.get(
      "spark.sql.parquet.columnarReaderBatchSize") == "1111",
      "batch-size property must reach the scan's reader configuration")
    assert(df.count() == raw.count())
    // ...and the CALLER's session conf is untouched (no cross-table leak)
    assert(spark.conf.get("spark.sql.parquet.columnarReaderBatchSize") == "4096",
      "a table's batch-size choice must not leak into the shared session")
  }

  test("disabled vectorization is honored (row-at-a-time read, same rows)") {
    val t = IceTable.create(cat, TableIdentifier.parse("db.pt_novec"),
      SparkConv.fromSpark(raw.schema), properties = Map(
        "read.parquet.vectorization.enabled" -> "false"))
    t.append(spark).appendDataFrame(raw)
    val df = t.newScan().toDF(spark)
    assert(df.sparkSession.conf.get(
      "spark.sql.parquet.enableVectorizedReader") == "false")
    assert(df.count() == raw.count())
    // two tables with CONFLICTING settings scanned in the same session:
    // each DataFrame carries its own, neither wins globally
    val t2 = IceTable.load(cat, TableIdentifier.parse("db.pt_vec"))
    val df2 = t2.newScan().toDF(spark)
    assert(df2.sparkSession.conf.get(
      "spark.sql.parquet.enableVectorizedReader") == "true")
    assert(df.sparkSession.conf.get(
      "spark.sql.parquet.enableVectorizedReader") == "false")
    assert(spark.conf.get("spark.sql.parquet.enableVectorizedReader") == "true")
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

  test("a bad vectorization value fails loudly at the commit that sets it") {
    // commit-time value validation (validateValues): a typo'd declared
    // key refuses at CREATE, never lying in wait for the first scan
    val e = intercept[IllegalArgumentException] {
      IceTable.create(cat, TableIdentifier.parse("db.pt_badvec"),
        SparkConv.fromSpark(raw.schema), properties = Map(
          "read.parquet.vectorization.batch-size" -> "lots"))
    }
    assert(e.getMessage.contains("read.parquet.vectorization.batch-size"),
      e.getMessage)
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

  test("metadata byte-binning makes the many-manifest plane plan faster " +
      "than one task per manifest (bit-equal plans)") {
    // 400 one-entry manifests (merge disabled): the commit-heavy table
    // shape where metadata-plane task overhead dominates planning.
    val nCommits = 400
    val regionPath = "/root/testdata/sf0.001/region.parquet"
    val t = IceTable.create(cat, TableIdentifier.parse("db.pt_metabin"),
      SparkConv.fromSpark(spark.read.parquet(regionPath).schema),
      properties = Map(
        "commit.manifest-merge.enabled" -> "false",
        "read.data-planning-mode" -> "distributed"))
    (0 until nCommits).foreach(_ => t.append(spark).addFiles(Seq(regionPath)))

    def planPaths(): Seq[String] = t.newScan().planFiles().map(_.file.filePath)
    def timeIt(): Double = {
      val t0 = System.nanoTime(); planPaths(); (System.nanoTime() - t0) / 1e9
    }
    def minOf3(): Double = (0 until 3).map(_ => timeIt()).min

    // per-manifest tasks: target=1 byte -> every manifest rides alone
    t.commit(b => b.copy(properties =
      b.properties + ("read.split.metadata-target-size" -> "1")))
    val plansSolo = planPaths()
    val solo = minOf3()
    // binned (default 32 MiB target, slot-adaptive): tasks ~ cores
    t.commit(b => b.copy(properties =
      b.properties - "read.split.metadata-target-size"))
    val plansBinned = planPaths()
    val binned = minOf3()

    assert(plansBinned.sorted == plansSolo.sorted,
      "binning must never change WHAT is planned")
    assert(plansBinned.size == nCommits)
    info(f"metadata plane: $nCommits manifests, per-manifest $solo%.2f s, " +
      f"binned $binned%.2f s (${solo / binned}%.1fx)")
    assert(binned < solo,
      f"byte-binned planning ($binned%.2f s) must beat one task per " +
        f"manifest ($solo%.2f s) at $nCommits manifests")
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

  test("SQL INSERT INTO an upsert table upserts too — V2 and Scala " +
      "surfaces agree (and keyless refuses on both)") {
    val schema0 = SparkConv.fromSpark(
      spark.range(0, 0).selectExpr("id", "CAST(id AS STRING) AS v").schema)
    val keyId = schema0.findFieldByName("id").get.id
    val schema = schema0.copy(identifierFieldIds = Seq(keyId))
    IceTable.create(cat, TableIdentifier.parse("db.pt_upsert_sql"), schema,
      properties = Map("write.upsert.enabled" -> "true"))
    spark.sql("INSERT INTO ice.db.pt_upsert_sql " +
      "SELECT id, CAST(id AS STRING) AS v FROM range(0, 100)")
    spark.sql("INSERT INTO ice.db.pt_upsert_sql " +
      "SELECT id, concat('new-', id) AS v FROM range(50, 120)")
    val out = spark.table("ice.db.pt_upsert_sql")
    assert(out.count() == 120L, "SQL INSERT on an upsert table must not " +
      "append duplicate keys")
    assert(out.groupBy("id").count().filter("count > 1").count() == 0L)
    assert(out.filter("id = 75 AND v = 'new-75'").count() == 1L)
    assert(out.filter("id = 10 AND v = '10'").count() == 1L)
    // parity with the Scala append API: same inputs -> same visible rows
    // (db.pt_upsert in the previous test ran the identical sequence)
    val scala0 = IceTable.load(cat, TableIdentifier.parse("db.pt_upsert"))
      .newScan().toDF(spark)
    assert(out.orderBy("id").collect().map(_.toString).toSeq ==
      scala0.orderBy("id").collect().map(_.toString).toSeq,
      "SQL and Scala upsert surfaces must produce identical table state")
    // merge-on-read on the SQL surface too
    val tSql = IceTable.load(cat, TableIdentifier.parse("db.pt_upsert_sql"))
    assert(tSql.planDeleteEntries(tSql.currentSnapshot.get).nonEmpty)

    // keyless upsert table refuses SQL INSERT exactly like the Scala path
    IceTable.create(cat, TableIdentifier.parse("db.pt_upsert_sqlnokey"),
      schema0, properties = Map("write.upsert.enabled" -> "true"))
    val e = intercept[Exception] {
      spark.sql("INSERT INTO ice.db.pt_upsert_sqlnokey " +
        "SELECT id, CAST(id AS STRING) AS v FROM range(0, 10)")
    }
    assert(e.getMessage.contains("identifier"), e.getMessage)
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
        "current-snapshot-summary", "current-snapshot-timestamp-ms",
        "format-version")) {
      val e = intercept[IllegalArgumentException] {
        t.commit(b => b.copy(properties = b.properties + (k -> "x")))
      }
      assert(e.getMessage.contains("reserved"), s"$k must refuse: ${e.getMessage}")
    }
    // ordinary properties still commit
    t.commit(b => b.copy(properties = b.properties + ("owner" -> "me")))
    assert(t.properties("owner") == "me")

    // The reference reserves the -ms spelling exactly
    // (table_properties.h:67-68, table_properties.cc:27-30); the bare
    // spelling is NOT reserved and must pass as a plain user property.
    t.commit(b =>
      b.copy(properties = b.properties + ("current-snapshot-timestamp" -> "1")))
    assert(t.properties("current-snapshot-timestamp") == "1")

    // encryption.* (table_properties.h:275-276): validated-inert — the
    // key-id round-trips as a plain property; the DEK length pins to the
    // AES key sizes and refuses anything else AT COMMIT
    t.commit(b => b.copy(properties = b.properties ++
      Map("encryption.key-id" -> "kms://team/table-key",
        "encryption.data-key-length" -> "32")))
    assert(t.properties("encryption.key-id") == "kms://team/table-key")
    assert(TableProperties.get(t.properties,
      TableProperties.EncryptionDekLength) == 32)
    val eDek = intercept[IllegalArgumentException] {
      t.commit(b => b.copy(properties = b.properties +
        ("encryption.data-key-length" -> "15")))
    }
    assert(eDek.getMessage.contains("data-key-length"), eDek.getMessage)

    // SQL TBLPROPERTIES surface refuses the exact reference spelling too
    spark.sql("CREATE TABLE ice.db.pt_resv_sql (id INT) USING graft")
    val eSql = intercept[Exception] {
      spark.sql("ALTER TABLE ice.db.pt_resv_sql SET TBLPROPERTIES " +
        "('current-snapshot-timestamp-ms' = '1')")
    }
    assert(eSql.getMessage.contains("reserved"), eSql.getMessage)

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
    val e4 = intercept[IllegalArgumentException] {
      RestJson.applyUpdates(t.metadata,
        Seq(RestJson.SetProperties(Map("current-snapshot-timestamp-ms" -> "1"))))
    }
    assert(e4.getMessage.contains("reserved"))

    // format-version stays legitimate at CREATE (consumed, not stored)
    val t3 = IceTable.create(cat, TableIdentifier.parse("db.pt_resv3"), schema,
      properties = Map("format-version" -> "3"))
    assert(t3.metadata.formatVersion == 3)
    assert(!t3.properties.contains("format-version"))
  }
}
