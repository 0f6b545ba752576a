package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.distributions.{ClusteredDistribution, OrderedDistribution}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, RequiresDistributionAndOrdering}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ice._
import graft.ice.catalog._
import graft.ice.meta.{PartitionField, PartitionSpec, SortField, SortOrder}
import graft.ice.transform.{BucketTransform, IdentityTransform}
import graft.ice.types._

/** Native V2 write path (GraftWrite): table-declared distribution and
  * ordering, executor-side commit metadata, overwrite modes, and
  * streaming epochs — the properties the old V1 fallback could not
  * express. */
class ConnectorWriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("whwrite").toString

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

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def writeInfo(t: IceTable): LogicalWriteInfo = new LogicalWriteInfo {
    override def queryId(): String = "test-query"
    override def schema() = SparkConv.toSpark(t.schema)
    override def options() = CaseInsensitiveStringMap.empty()
  }

  test("the write declares the table's partitioning as its distribution") {
    val schema = Schema(0, IndexedSeq(
      NestedField(1, "id", LongT, required = true),
      NestedField(2, "v", StringT, required = false)))
    val spec = PartitionSpec(0, IndexedSeq(
      PartitionField(1, 1000, "id_bucket", BucketTransform(8))))
    val t = IceTable.create(cat, TableIdentifier.parse("db.wdist"), schema, spec)

    val sparkTable = new graft.ice.connector.GraftSparkTable(
      t, "ice", "db.wdist", warehouse)
    val write = sparkTable.newWriteBuilder(writeInfo(t)).build()
    val rdo = write.asInstanceOf[RequiresDistributionAndOrdering]
    val dist = rdo.requiredDistribution()
    assert(dist.isInstanceOf[ClusteredDistribution])
    val exprs = dist.asInstanceOf[ClusteredDistribution].clustering()
    assert(exprs.length == 1 && exprs.head.toString.contains("bucket"))
    assert(rdo.requiredOrdering().nonEmpty)
    // clustering is advisory: AQE may size the exchange; a violation
    // costs extra files, never correctness
    assert(!rdo.distributionStrictlyRequired())
  }

  test("a sorted unpartitioned table asks for an ordered distribution") {
    val schema = Schema(0, IndexedSeq(
      NestedField(1, "id", LongT, required = true),
      NestedField(2, "v", StringT, required = false)))
    val t = IceTable.create(cat, TableIdentifier.parse("db.wsort"), schema,
      sortOrder = SortOrder(1, IndexedSeq(
        SortField(1, IdentityTransform, ascending = true, nullsFirst = true))))
    val sparkTable = new graft.ice.connector.GraftSparkTable(
      t, "ice", "db.wsort", warehouse)
    val rdo = sparkTable.newWriteBuilder(writeInfo(t)).build()
      .asInstanceOf[RequiresDistributionAndOrdering]
    assert(rdo.requiredDistribution().isInstanceOf[OrderedDistribution])

    // the ordered write produces files with disjoint id ranges
    spark.range(0, 4000).select(col("id"),
        concat(lit("v"), col("id")).as("v"))
      .repartition(4) // deliberately scrambled input
      .writeTo("ice.db.wsort").append()
    val t2 = IceTable.load(cat, TableIdentifier.parse("db.wsort"))
    val files = t2.newScan().planFiles().map(_.file)
    assert(files.nonEmpty)
    val ranges = files.map { f =>
      val lo = java.nio.ByteBuffer.wrap(f.lowerBounds(1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
      val hi = java.nio.ByteBuffer.wrap(f.upperBounds(1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
      (lo, hi)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hiA), (loB, _)) => assert(hiA < loB,
        s"file ranges overlap: $ranges")
      case _ => ()
    }
    assert(sortedRows(spark.table("ice.db.wsort")).size == 4000)
  }

  test("clustered append: one file per partition, executor-shipped metrics") {
    spark.sql("CREATE TABLE ice.db.wclust (k INT, v STRING) PARTITIONED BY (k)")
    val src = spark.range(0, 3000)
      .select((col("id") % 5).cast("int").as("k"),
        concat(lit("v"), col("id")).as("v"))
      .repartition(4) // scrambled: the TABLE must request the clustering
    src.writeTo("ice.db.wclust").append()

    val t = IceTable.load(cat, TableIdentifier.parse("db.wclust"))
    val files = t.newScan().planFiles().map(_.file)
    // the requested distribution co-locates each k in one task: exactly
    // one file per distinct partition value
    assert(files.size == 5, s"expected 5 files, got ${files.map(_.filePath)}")
    assert(files.map(_.partition.head).toSet == Set(0, 1, 2, 3, 4))
    // executor-side footer metrics made it into the manifest
    assert(files.forall(_.recordCount == 600))
    assert(files.forall(f => f.lowerBounds.nonEmpty && f.upperBounds.nonEmpty))
    assert(files.forall(f => f.valueCounts.values.forall(_ == 600)))
    assert(sortedRows(spark.table("ice.db.wclust")) == sortedRows(src))
    // field ids landed in the footers (id-based projection on read)
    assert(ScanBuilder.hasFieldIds(files.head.filePath, spark))
  }

  test("INSERT OVERWRITE a static partition replaces exactly that partition") {
    spark.sql("CREATE TABLE ice.db.wover (k INT, v STRING) PARTITIONED BY (k)")
    spark.sql("INSERT INTO ice.db.wover VALUES (1, 'a'), (1, 'b'), (2, 'c')")
    spark.sql("INSERT OVERWRITE ice.db.wover PARTITION (k = 1) VALUES ('A')")
    assert(sortedRows(spark.table("ice.db.wover")) ==
      Seq("[1,A]", "[2,c]"))
    // unfiltered INSERT OVERWRITE truncates
    spark.sql("INSERT OVERWRITE ice.db.wover VALUES (9, 'z')")
    assert(sortedRows(spark.table("ice.db.wover")) == Seq("[9,z]"))
  }

  test("overwrite by a non-partition filter is rejected, not partially applied") {
    spark.sql("CREATE TABLE ice.db.wbad (k INT, v STRING) PARTITIONED BY (k)")
    spark.sql("INSERT INTO ice.db.wbad VALUES (1, 'a'), (2, 'b')")
    val df = spark.sql("SELECT 1 AS k, 'x' AS v")
    val e = intercept[Exception] {
      df.writeTo("ice.db.wbad").overwrite(col("v") === "a")
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      c.isInstanceOf[UnsupportedOperationException] &&
        c.getMessage.contains("not an identity partition column")))
    // table unchanged
    assert(sortedRows(spark.table("ice.db.wbad")) == Seq("[1,a]", "[2,b]"))
  }

  test("dynamic overwritePartitions replaces only the touched partitions") {
    spark.sql("CREATE TABLE ice.db.wdyn (k INT, v STRING) PARTITIONED BY (k)")
    spark.sql("INSERT INTO ice.db.wdyn VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql("SELECT * FROM VALUES (1, 'A'), (3, 'C') AS t(k, v)")
      .writeTo("ice.db.wdyn").overwritePartitions()
    assert(sortedRows(spark.table("ice.db.wdyn")) ==
      Seq("[1,A]", "[2,b]", "[3,C]"))
  }

  test("writeStream.toTable: appends per epoch, exactly-once across restart") {
    import spark.implicits._
    spark.sql("CREATE TABLE ice.db.wstream (value BIGINT)")
    val ckpt = java.nio.file.Files.createTempDirectory("wstream-ckpt").toString

    val s1 = MemoryStream[Long](spark)
    s1.addData(1L, 2L, 3L)
    val q1 = s1.toDF().writeStream
      .option("checkpointLocation", ckpt)
      .toTable("ice.db.wstream")
    q1.processAllAvailable()
    q1.stop()
    assert(sortedRows(spark.table("ice.db.wstream")) ==
      Seq("[1]", "[2]", "[3]"))

    // restart from the same checkpoint: only NEW data lands
    s1.addData(4L, 5L)
    val q2 = s1.toDF().writeStream
      .option("checkpointLocation", ckpt)
      .toTable("ice.db.wstream")
    q2.processAllAvailable()
    q2.stop()
    assert(sortedRows(spark.table("ice.db.wstream")) ==
      Seq("[1]", "[2]", "[3]", "[4]", "[5]"))

    // the epoch watermark is persisted for replay detection
    val t = IceTable.load(cat, TableIdentifier.parse("db.wstream"))
    val epochKey = t.properties.keys.find(_.startsWith("graft.stream.epoch."))
    assert(epochKey.isDefined)
    assert(t.properties(epochKey.get).toLong >= 1L)
  }

  test("a replayed streaming epoch is dropped, its files cleaned up") {
    import org.apache.spark.sql.connector.write.WriterCommitMessage
    spark.sql("CREATE TABLE ice.db.wreplay (value BIGINT)")
    val t = IceTable.load(cat, TableIdentifier.parse("db.wreplay"))
    val sparkTable = new graft.ice.connector.GraftSparkTable(
      t, "ice", "db.wreplay", warehouse)
    val sw = sparkTable.newWriteBuilder(writeInfo(t)).build().toStreaming

    // first delivery of epoch 7
    val f1 = java.nio.file.Files.createTempFile("epoch7", ".parquet")
    spark.range(1).coalesce(1).write.mode("overwrite")
      .parquet(f1.toString + ".dir")
    val df1 = new java.io.File(f1.toString + ".dir").listFiles()
      .find(_.getName.endsWith(".parquet")).get.getPath
    def msg(path: String): Array[WriterCommitMessage] = Array(
      graft.ice.connector.GraftWriteMessage(Seq(
        graft.ice.manifest.DataFile(graft.ice.manifest.FileContent.Data,
          path, "PARQUET", IndexedSeq.empty, recordCount = 1,
          fileSizeInBytes = java.nio.file.Files.size(
            java.nio.file.Paths.get(path))))))
    sw.commit(7L, msg(df1))
    val after1 = IceTable.load(cat, TableIdentifier.parse("db.wreplay"))
    assert(after1.newScan().planFiles().size == 1)

    // replay of epoch 7 (sink committed, checkpoint didn't): no new
    // snapshot, and the replay's orphan file is deleted
    val replayFile = java.nio.file.Files.createTempFile("replay", ".parquet")
    sw.commit(7L, msg(replayFile.toString))
    val after2 = IceTable.load(cat, TableIdentifier.parse("db.wreplay"))
    assert(after2.metadata.currentSnapshotId == after1.metadata.currentSnapshotId)
    assert(!java.nio.file.Files.exists(replayFile))
  }

  // ---- native row-level DML (SupportsRowLevelOperations) ----
  // NOTE: this suite's session has NO GraftExtensions — these paths go
  // through Spark's own RewriteUpdateTable / RewriteMergeIntoTable /
  // RewriteDeleteFromTable against the V2 table contract alone.

  test("native UPDATE without extensions rewrites only the matched partition's files") {
    spark.sql("CREATE TABLE ice.db.rlup (id BIGINT, part STRING, v BIGINT) PARTITIONED BY (part)")
    spark.sql("INSERT INTO ice.db.rlup VALUES (1, 'a', 10), (2, 'a', 20), (3, 'b', 30), (4, 'b', 40)")
    spark.sql("UPDATE ice.db.rlup SET v = v + 100 WHERE part = 'a' AND id = 1")
    assert(sortedRows(spark.table("ice.db.rlup")) ==
      Seq("[1,a,110]", "[2,a,20]", "[3,b,30]", "[4,b,40]"))
    // group-based CoW: partition 'b' untouched — exactly one data file
    // (partition a's) was replaced in the overwrite snapshot
    val t = IceTable.load(cat, TableIdentifier.parse("db.rlup"))
    val snap = t.currentSnapshot.get
    assert(snap.summary.get("removed-data-files").contains("1"),
      s"expected 1 replaced file, summary=${snap.summary}")
  }

  test("native MERGE without extensions: update + insert through Spark's rewrite") {
    spark.sql("CREATE TABLE ice.db.rlmrg (id BIGINT, v STRING)")
    spark.sql("INSERT INTO ice.db.rlmrg VALUES (1, 'one'), (2, 'two')")
    spark.range(2, 5).selectExpr("id", "concat('n', id) AS v")
      .createOrReplaceTempView("rl_src")
    spark.sql("""MERGE INTO ice.db.rlmrg t USING rl_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT *""")
    assert(sortedRows(spark.table("ice.db.rlmrg")) ==
      Seq("[1,one]", "[2,n2]", "[3,n3]", "[4,n4]"))
  }

  test("native DELETE with an untranslatable predicate falls back to the row-level rewrite") {
    spark.sql("CREATE TABLE ice.db.rldel (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO ice.db.rldel VALUES (1, 1), (2, 2), (3, 3), (4, 4)")
    // v % 2 = 0 has no V1Filter form -> canDeleteWhere refuses the
    // metadata path; Spark's RewriteDeleteFromTable plans the CoW
    // rewrite through the row-level operation instead of erroring
    spark.sql("DELETE FROM ice.db.rldel WHERE v % 2 = 0")
    assert(sortedRows(spark.table("ice.db.rldel")) == Seq("[1,1]", "[3,3]"))
  }
}
