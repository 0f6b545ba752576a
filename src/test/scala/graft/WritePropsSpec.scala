package graft

import scala.jdk.CollectionConverters._

import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ice._
import graft.ice.catalog._
import graft.ice.meta.{PartitionField, PartitionSpec, TableProperties}
import graft.ice.transform.IdentityTransform
import graft.ice.types._

/** The reference's DECLARED write-tuning surface
  * (table_properties.h:111-235) exercised end-to-end: parquet codec /
  * row-group / page sizes reaching the footers, per-column metrics
  * modes with their downstream refusal obligations, the monotone
  * bound-width floor, object-store hash-prefix layout, `write.data.path`
  * split roots, and per-partition commit summaries. */
class WritePropsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("whprops").toString

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

  private def dataFiles(t: IceTable): Seq[String] =
    t.newScan().planFiles().map(_.file.filePath)

  private def footerCodecs(path: String): Set[String] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path), new org.apache.hadoop.conf.Configuration()))
    try reader.getFooter.getBlocks.asScala
      .flatMap(_.getColumns.asScala.map(_.getCodec.name())).toSet
    finally reader.close()
  }

  private def rowGroupCount(path: String): Int = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path), new org.apache.hadoop.conf.Configuration()))
    try reader.getFooter.getBlocks.size
    finally reader.close()
  }

  private def bloomOffsets(path: String, column: String): Seq[Long] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path), new org.apache.hadoop.conf.Configuration()))
    try reader.getFooter.getBlocks.asScala.toSeq.map(
      _.getColumns.asScala.find(_.getPath.toDotString == column).get
        .getBloomFilterOffset)
    finally reader.close()
  }

  test("per-column bloom filters reach the footers on BOTH write paths; point lookup stays exact") {
    val raw = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    // tiny dictionary page: parquet drops the bloom filter when a chunk
    // stays fully dictionary-encoded (the dictionary is already an exact
    // filter), so the high-cardinality key must overflow into plain
    val props = Map(
      "write.parquet.bloom-filter-enabled.column.o_custkey" -> "true",
      "write.parquet.bloom-filter-fpp.column.o_custkey" -> "0.01",
      "write.parquet.bloom-filter-max-bytes" -> "65536",
      "write.parquet.dict-size-bytes" -> "1024")

    // path API write
    val t = IceTable.create(cat, TableIdentifier.parse("db.wt_bloom"),
      SparkConv.fromSpark(raw.schema), properties = props)
    t.append(spark).appendDataFrame(raw)
    val files = dataFiles(t)
    assert(files.nonEmpty)
    files.foreach { f =>
      assert(bloomOffsets(f, "o_custkey").forall(_ >= 0),
        s"no bloom filter for o_custkey in $f")
      // un-enabled columns carry none
      assert(bloomOffsets(f, "o_orderstatus").forall(_ < 0),
        s"unexpected bloom filter for o_orderstatus in $f")
    }

    // connector (executor-writer) path: SQL INSERT through the catalog
    spark.sql("CREATE TABLE ice.db.wt_bloom_v2 (o_custkey BIGINT, o_totalprice DOUBLE) " +
      "TBLPROPERTIES ('write.parquet.bloom-filter-enabled.column.o_custkey'='true'," +
      " 'write.parquet.dict-size-bytes'='1024')")
    spark.sql("INSERT INTO ice.db.wt_bloom_v2 " +
      "SELECT o_custkey, o_totalprice FROM parquet.`/root/testdata/sf0.01/orders.parquet`")
    val t2 = IceTable.load(cat, TableIdentifier.parse("db.wt_bloom_v2"))
    dataFiles(t2).foreach { f =>
      assert(bloomOffsets(f, "o_custkey").forall(_ >= 0),
        s"connector write lost the bloom filter in $f")
    }

    // point lookup through the scan stays exact
    val key = raw.select("o_custkey").head.getLong(0)
    val got = t.newScan().toDF(spark).filter(col("o_custkey") === key).count()
    assert(got == raw.filter(col("o_custkey") === key).count())
  }

  test("write.parquet.* tuning reaches the data-file footers; default codec is zstd") {
    val raw = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

    // defaults: the registry's declared codec (zstd), NOT Spark's snappy
    val tDef = IceTable.create(cat, TableIdentifier.parse("db.wt_default"),
      SparkConv.fromSpark(raw.schema))
    tDef.append(spark).appendDataFrame(raw)
    val defFiles = dataFiles(tDef)
    assert(defFiles.nonEmpty)
    defFiles.foreach(f => assert(footerCodecs(f) == Set("ZSTD"),
      s"default table wrote ${footerCodecs(f)} at $f, expected ZSTD"))

    // configured: gzip + 64 KiB row groups -> several row groups per file
    // (sf0.01 orders: 15k rows, comfortably past one 64 KiB buffer)
    val raw10 = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    val tGz = IceTable.create(cat, TableIdentifier.parse("db.wt_gzip"),
      SparkConv.fromSpark(raw10.schema),
      properties = Map(
        "write.parquet.compression-codec" -> "gzip",
        "write.parquet.row-group-size-bytes" -> "65536",
        "write.parquet.page-size-bytes" -> "16384"))
    tGz.append(spark).appendDataFrame(raw10.repartition(1))
    val gzFiles = dataFiles(tGz)
    assert(gzFiles.nonEmpty)
    gzFiles.foreach(f => assert(footerCodecs(f) == Set("GZIP"),
      s"configured table wrote ${footerCodecs(f)} at $f, expected GZIP"))
    assert(gzFiles.map(rowGroupCount).sum > gzFiles.size,
      s"64 KiB row groups should split ${raw10.count()} orders rows into " +
        s"multiple row groups per file (got 1 each)")

    // both tables scan value-identically to the source
    assert(tGz.newScan().toDF(spark).collect().map(_.toString).sorted.toSeq ==
      raw10.collect().map(_.toString).sorted.toSeq)
  }

  test("row-group-check-{min,max}-record-count throttles the flush check " +
      "(both write paths + delete twins; values validate)") {
    val raw10 = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    val schema = SparkConv.fromSpark(raw10.schema)

    // check-min past the row count: the writer never re-measures, so the
    // tiny 64 KiB row-group target CANNOT trigger — one row group per file
    val tLazy = IceTable.create(cat, TableIdentifier.parse("db.wt_rglazy"), schema,
      properties = Map(
        "write.parquet.row-group-size-bytes" -> "65536",
        "write.parquet.row-group-check-min-record-count" -> "1000000",
        "write.parquet.row-group-check-max-record-count" -> "2000000"))
    tLazy.append(spark).appendDataFrame(raw10.repartition(1))
    val lazyFiles = dataFiles(tLazy)
    assert(lazyFiles.map(rowGroupCount).sum == lazyFiles.size,
      s"check-min=1M must suppress every early flush check; got " +
        s"${lazyFiles.map(rowGroupCount).sum} row groups in ${lazyFiles.size} files")

    // eager checks: re-measure at most every 100 records — the 64 KiB
    // target now splits 15k orders rows into many row groups
    val eagerProps = Map(
      "write.parquet.row-group-size-bytes" -> "65536",
      "write.parquet.row-group-check-min-record-count" -> "10",
      "write.parquet.row-group-check-max-record-count" -> "100")
    val tEager = IceTable.create(cat, TableIdentifier.parse("db.wt_rgeager"),
      schema, properties = eagerProps)
    tEager.append(spark).appendDataFrame(raw10.repartition(1))
    val eagerFiles = dataFiles(tEager)
    assert(eagerFiles.map(rowGroupCount).sum > eagerFiles.size,
      "check-max=100 with 64 KiB row groups must flush multiple row groups")

    // connector (SQL INSERT) path honors the same knobs via builder calls
    raw10.createOrReplaceTempView("wt_rg_src")
    spark.sql("CREATE TABLE ice.db.wt_rgsql (o_orderkey BIGINT) USING graft " +
      "TBLPROPERTIES ('write.parquet.row-group-size-bytes'='65536', " +
      "'write.parquet.row-group-check-min-record-count'='10', " +
      "'write.parquet.row-group-check-max-record-count'='100')")
    spark.sql("INSERT INTO ice.db.wt_rgsql " +
      "SELECT o_orderkey FROM wt_rg_src DISTRIBUTE BY 1")
    val sqlFiles = dataFiles(IceTable.load(cat, TableIdentifier.parse("db.wt_rgsql")))
    assert(sqlFiles.map(rowGroupCount).sum > sqlFiles.size,
      "connector write path must honor the check-count knobs")

    // delete twins throttle the DELETE plane independently
    val tDel = IceTable.create(cat, TableIdentifier.parse("db.wt_rgdel"),
      SparkConv.fromSpark(raw10.select("o_orderkey").schema),
      properties = Map(
        "write.delete.mode" -> "merge-on-read",
        "write.delete.parquet.row-group-size-bytes" -> "16384",
        "write.delete.parquet.row-group-check-min-record-count" -> "10",
        "write.delete.parquet.row-group-check-max-record-count" -> "50"))
    tDel.append(spark).appendDataFrame(raw10.select("o_orderkey").repartition(1))
    tDel.delete(spark).deleteByEquality(
      raw10.filter("o_orderkey % 2 = 0").select("o_orderkey"))
    val delFiles = tDel.currentSnapshot.toSeq
      .flatMap(tDel.planDeleteEntries).map(_.dataFile.filePath)
      .filter(_.endsWith(".parquet"))
    assert(delFiles.nonEmpty)
    assert(delFiles.map(rowGroupCount).sum > delFiles.size,
      "delete-plane check twins must flush multiple row groups at 16 KiB")

    // the four keys parse + validate: non-positive values refuse at commit
    val eBad = intercept[IllegalArgumentException] {
      IceTable.create(cat, TableIdentifier.parse("db.wt_rgbad"), schema,
        properties = Map("write.parquet.row-group-check-min-record-count" -> "0"))
    }
    assert(eBad.getMessage.contains("row-group-check-min-record-count"))
    val eBad2 = intercept[IllegalArgumentException] {
      tLazy.commit(b => b.copy(properties = b.properties +
        ("write.delete.parquet.row-group-check-max-record-count" -> "nope")))
    }
    assert(eBad2.getMessage.contains("row-group-check-max-record-count"))
  }

  test("write.delete.parquet.compression-codec tunes the DELETE plane independently") {
    val raw = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val t = IceTable.create(cat, TableIdentifier.parse("db.wt_delcodec"),
      SparkConv.fromSpark(raw.schema),
      properties = Map(
        "write.parquet.compression-codec" -> "zstd",
        "write.delete.parquet.compression-codec" -> "gzip",
        "write.delete.mode" -> "merge-on-read"))
    t.append(spark).appendDataFrame(raw)
    import spark.implicits._
    t.delete(spark).deleteByEquality(
      raw.filter("o_orderkey % 100 = 0").select("o_orderkey"))
    val delFiles = t.currentSnapshot.toSeq
      .flatMap(t.planDeleteEntries).map(_.dataFile.filePath)
      .filter(_.endsWith(".parquet"))
    assert(delFiles.nonEmpty, "expected a parquet equality-delete file")
    delFiles.foreach(f => assert(footerCodecs(f) == Set("GZIP"),
      s"delete file $f wrote ${footerCodecs(f)}, expected GZIP"))
    dataFiles(t).foreach(f => assert(footerCodecs(f) == Set("ZSTD")))
    // the MoR scan still nets out the deleted keys
    assert(t.newScan().toDF(spark).count() ==
      raw.filter("o_orderkey % 100 != 0").count())
  }

  test("metrics modes gate what manifests persist: none/counts/truncate(W)/full + cap") {
    import spark.implicits._
    val df = Seq(
      ("alpha-0123456789-long", "bravo-0123456789-long", "c-one", "d-one", 1L),
      ("zulu-9876543210-long", "yankee-9876543210-long", "c-two", "d-two", 2L))
      .toDF("a", "b", "c", "d", "e").coalesce(1)
    val t = IceTable.create(cat, TableIdentifier.parse("db.wt_modes"),
      SparkConv.fromSpark(df.schema),
      properties = Map(
        "write.metadata.metrics.default" -> "counts",
        "write.metadata.metrics.column.a" -> "truncate(4)",
        "write.metadata.metrics.column.b" -> "full",
        // cap at 4: the 5th schema column (e) falls off the inferred
        // default and gets NO metrics
        "write.metadata.metrics.max-inferred-column-defaults" -> "4"))
    t.append(spark).appendDataFrame(df)
    val f = t.newScan().planFiles().map(_.file)
    assert(f.size == 1)
    val file = f.head
    val ids = t.schema.fields.map(fl => fl.name -> fl.id).toMap

    // truncate(4): bounds present, lower is a 4-codepoint prefix
    val aLower = new String(file.lowerBounds(ids("a")), "UTF-8")
    assert(aLower == "alph", s"truncate(4) lower bound was '$aLower'")
    // upper bound of width 4 (truncated+incremented) — never longer
    assert(new String(file.upperBounds(ids("a")), "UTF-8").length <= 4)

    // full: the exact long string survives untruncated
    assert(new String(file.lowerBounds(ids("b")), "UTF-8")
      == "bravo-0123456789-long")
    assert(new String(file.upperBounds(ids("b")), "UTF-8")
      == "yankee-9876543210-long")

    // counts (the default): value/null counts present, bounds withheld
    assert(file.valueCounts.contains(ids("c")))
    assert(file.nullValueCounts.contains(ids("c")))
    assert(!file.lowerBounds.contains(ids("c")) &&
      !file.upperBounds.contains(ids("c")))

    // past the inference cap: no counts, no bounds — but columnSizes
    // SURVIVE every mode (they are the default-injection absence proof;
    // dropping them would misread a present column as absent and inject
    // defaults over real data)
    assert(!file.valueCounts.contains(ids("e")) &&
      !file.nullValueCounts.contains(ids("e")) &&
      !file.lowerBounds.contains(ids("e")))
    assert(file.columnSizes.contains(ids("e")))
  }

  test("withheld metrics REFUSE pushdown (counts/none) and the bound-width " +
      "floor ratchets down monotonically") {
    import graft.ice.connector.GraftAggPushStats
    import spark.implicits._
    val df = Seq(("aa", "bb-0123456789-long", 1L), ("zz", "aa-0123456789-long", 2L))
      .toDF("s4", "scnt", "k")
    val t = IceTable.create(cat, TableIdentifier.parse("db.wt_refuse"),
      SparkConv.fromSpark(df.schema),
      properties = Map(
        "write.metadata.metrics.default" -> "counts",
        "write.metadata.metrics.column.s4" -> "truncate(4)"))
    t.append(spark).appendDataFrame(df)

    // the commit stamped the monotone floor at the narrowest width
    assert(IceTable.load(cat, TableIdentifier.parse("db.wt_refuse"))
      .properties.get(TableProperties.MetricsBoundWidthFloor.name).contains("4"))

    def push(sql: String): Boolean = {
      val before = GraftAggPushStats.pushes.get()
      spark.sql(sql).collect()
      GraftAggPushStats.pushes.get() == before + 1
    }
    // counts mode: bounds withheld -> MIN/MAX must refuse (and still answer)
    assert(!push("SELECT min(scnt) AS m FROM ice.db.wt_refuse"))
    assert(spark.sql("SELECT min(scnt) AS m FROM ice.db.wt_refuse")
      .collect().head.getString(0) == "aa-0123456789-long")
    // truncate(4) column with 2-char values: bounds shorter than the
    // floor are provably exact -> push succeeds
    assert(push("SELECT min(s4) AS mn, max(s4) AS mx FROM ice.db.wt_refuse"))

    // RAISING the width later must not resurrect exactness for old
    // bounds: floor stays at the historical minimum
    val t2 = IceTable.load(cat, TableIdentifier.parse("db.wt_refuse"))
    t2.commit(m => m.copy(properties = m.properties +
      ("write.metadata.metrics.column.s4" -> "truncate(16)")))
    val wide = Seq(("abcdefgh", "x", 3L)).toDF("s4", "scnt", "k")
    t2.append(spark).appendDataFrame(wide)
    val floorNow = IceTable.load(cat, TableIdentifier.parse("db.wt_refuse"))
      .properties(TableProperties.MetricsBoundWidthFloor.name)
    assert(floorNow == "4", s"floor must never ratchet up (got $floorNow)")
    // the new file's bound "abcdefgh" is 8 chars: a width-16 bound would
    // look exact under a floor of 16, but the FLOOR of 4 keeps it
    // unprovable -> refuse, answer ("zz" — still the true max) from the
    // scan
    assert(!push("SELECT max(s4) AS mx FROM ice.db.wt_refuse"))
    assert(spark.sql("SELECT max(s4) AS mx FROM ice.db.wt_refuse")
      .collect().head.getString(0) == "zz")
  }

  test("none-mode columns keep the default-injection absence proof sound") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val t = IceTable.create(cat, TableIdentifier.parse("db.wt_absence"),
      SparkConv.fromSpark(df.schema),
      properties = Map("write.metadata.metrics.default" -> "none"))
    t.append(spark).appendDataFrame(df)
    // add a defaulted column; files written BEFORE it predate the field
    t.updateSchema().addColumnWithDefault("flag", StringT,
      Some("absent"), Some("absent")).commit()
    val t2 = IceTable.load(cat, TableIdentifier.parse("db.wt_absence"))
    t2.append(spark).appendDataFrame(
      Seq((3L, "z", "present")).toDF("id", "v", "flag"))
    val got = t2.newScan().toDF(spark)
      .select("id", "flag").as[(Long, String)].collect().toMap
    // old files: flag absent -> default injected; new file: REAL value —
    // none-mode metrics must not make the new file look column-less
    assert(got == Map(1L -> "absent", 2L -> "absent", 3L -> "present"), got)
  }

  test("object-store layout: hash-prefix dispersion, layout-blind scans, " +
      "pruning, compaction and orphan sweep") {
    val raw = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val schema = SparkConv.fromSpark(raw.schema)
    val op = schema.findFieldByName("o_orderpriority").get.id
    val spec = PartitionSpec(0, IndexedSeq(
      PartitionField(op, 1000, "pri", IdentityTransform)))
    val t = IceTable.create(cat, TableIdentifier.parse("db.wt_objstore"),
      schema, spec, properties = Map("write.object-storage.enabled" -> "true"))
    t.append(spark).appendDataFrame(raw)

    val files = dataFiles(t)
    assert(files.nonEmpty)
    val binDirs = """.*/data/([01]{4})/([01]{4})/([01]{4})/([01]{4})/.*""".r
    val prefixes = files.map {
      case binDirs(a, b, c, d) => s"$a/$b/$c/$d"
      case other => fail(s"not hash-prefixed: $other")
    }
    assert(prefixes.toSet.size > 1,
      s"${files.size} files all landed under one prefix — no dispersion")
    // partition dirs are still in the path (partitioned-paths default true)
    assert(files.forall(_.contains("pri=")))

    // scans are layout-blind and partition pruning still prunes
    assert(t.newScan().toDF(spark).count() == raw.count())
    val pruned = t.newScan()
      .filter(graft.ice.expr.Expr.equal("o_orderpriority",
        Literal.string("1-URGENT"))).planFiles()
    assert(pruned.nonEmpty && pruned.size < files.size,
      s"partition pruning over the hashed layout: ${pruned.size}/${files.size}")

    // compaction round-trips the layout
    t.compact(spark).rewriteDataFiles(targetFileSizeBytes = 512L * 1024 * 1024)
    val t2 = IceTable.load(cat, TableIdentifier.parse("db.wt_objstore"))
    assert(t2.newScan().toDF(spark).count() == raw.count())

    // orphan sweep: a planted file under a hash dir goes, live files stay
    val planted = java.nio.file.Paths.get(
      t2.dataFileDir, "0000", "0000", "0000", "0000", "orphan.parquet")
    java.nio.file.Files.createDirectories(planted.getParent)
    java.nio.file.Files.write(planted, Array[Byte](1, 2, 3))
    val removed = t2.maintenance().removeOrphanFiles(
      olderThanMs = System.currentTimeMillis() + 1000)
    assert(removed.exists(_.endsWith("orphan.parquet")), removed.take(5))
    assert(t2.newScan().toDF(spark).count() == raw.count())

    // partitioned-paths=false drops the partition dirs from the path
    val t3 = IceTable.create(cat, TableIdentifier.parse("db.wt_objflat"),
      schema, spec, properties = Map(
        "write.object-storage.enabled" -> "true",
        "write.object-storage.partitioned-paths" -> "false"))
    t3.append(spark).appendDataFrame(raw)
    val flat = dataFiles(t3)
    assert(flat.forall(!_.contains("pri=")), flat.take(3))
    assert(flat.toSet.size == flat.size, "flattened names must stay unique")
    assert(t3.newScan().toDF(spark).count() == raw.count())
  }

  test("write.data.path: mid-life move splits roots; scans, metadata tables " +
      "and the orphan sweep cover both") {
    val raw = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
    val t = IceTable.create(cat, TableIdentifier.parse("db.wt_datapath"),
      SparkConv.fromSpark(raw.schema))
    t.append(spark).appendDataFrame(raw.filter("s_suppkey % 2 = 0"))
    val extRoot = s"$warehouse/external_data/wt_datapath"
    t.commit(m => m.copy(properties =
      m.properties + ("write.data.path" -> extRoot)))
    t.append(spark).appendDataFrame(raw.filter("s_suppkey % 2 = 1"))

    val t2 = IceTable.load(cat, TableIdentifier.parse("db.wt_datapath"))
    assert(t2.dataFileDir == extRoot)
    val files = dataFiles(t2)
    val (ext, orig) = files.partition(_.startsWith(extRoot))
    assert(ext.nonEmpty && orig.nonEmpty,
      s"expected files under BOTH roots, got ext=${ext.size} orig=${orig.size}")
    // the scan reads both roots, id-resolved (values identical to source)
    assert(t2.newScan().toDF(spark).collect().map(_.toString).sorted.toSeq ==
      raw.collect().map(_.toString).sorted.toSeq)
    // m_files metadata table shows the mixed roots
    val mfiles = MetadataTables.files(spark, t2)
      .select("file_path").collect().map(_.getString(0))
    assert(mfiles.exists(_.startsWith(extRoot)) &&
      mfiles.exists(!_.startsWith(extRoot)))

    // orphan sweep walks the external root too
    val planted = java.nio.file.Paths.get(extRoot, "orphan-ext.parquet")
    java.nio.file.Files.write(planted, Array[Byte](9, 9))
    val removed = t2.maintenance().removeOrphanFiles(
      olderThanMs = System.currentTimeMillis() + 1000)
    assert(removed.exists(_.endsWith("orphan-ext.parquet")), removed.take(5))
    assert(t2.newScan().toDF(spark).count() == raw.count())
  }

  test("write.summary.partition-limit: per-partition churn entries, capped") {
    val raw = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val schema = SparkConv.fromSpark(raw.schema)
    val op = schema.findFieldByName("o_orderpriority").get.id
    val spec = PartitionSpec(0, IndexedSeq(
      PartitionField(op, 1000, "pri", IdentityTransform)))

    val t = IceTable.create(cat, TableIdentifier.parse("db.wt_psum"),
      schema, spec, properties = Map("write.summary.partition-limit" -> "10"))
    t.append(spark).appendDataFrame(raw)
    val s = t.currentSnapshot.get.summary
    assert(s.get("changed-partition-count").contains("5"), s)
    assert(s.get("partition-summaries-included").contains("true"))
    val perPart = s.filter(_._1.startsWith("partitions.pri="))
    assert(perPart.size == 5, perPart.keys)
    val urgent = perPart("partitions.pri=1-URGENT")
    val expected = raw.filter("o_orderpriority = '1-URGENT'").count()
    assert(urgent.contains(s"added-records=$expected"), urgent)

    // delete-driven churn shows up as removed-* on the touched partition
    val t1 = IceTable.load(cat, TableIdentifier.parse("db.wt_psum"))
    t1.delete(spark).deleteWhere(graft.ice.expr.Expr.equal("o_orderpriority",
      Literal.string("1-URGENT")))
    val s1 = IceTable.load(cat, TableIdentifier.parse("db.wt_psum"))
      .currentSnapshot.get.summary
    val delEntry = s1.get("partitions.pri=1-URGENT")
    assert(delEntry.exists(_.contains("removed-data-files=")), s1)

    // over the limit: per-partition detail suppressed, count kept
    val t2 = IceTable.create(cat, TableIdentifier.parse("db.wt_psum2"),
      schema, spec, properties = Map("write.summary.partition-limit" -> "2"))
    t2.append(spark).appendDataFrame(raw)
    val s2 = t2.currentSnapshot.get.summary
    assert(s2.get("changed-partition-count").contains("5"))
    assert(!s2.keys.exists(_.startsWith("partitions.")), s2.keys)

    // limit 0 (the declared default) disables the detail entirely
    val t3 = IceTable.create(cat, TableIdentifier.parse("db.wt_psum3"),
      schema, spec)
    t3.append(spark).appendDataFrame(raw)
    assert(!t3.currentSnapshot.get.summary.keys.exists(_.startsWith("partitions.")))
  }

  test("ORC tuning tail: codec/strategy/block/bloom/batch knobs thread to the writer") {
    import graft.ice.write.WriteTuning
    val props = Map(
      "write.orc.compression-codec" -> "snappy",
      "write.orc.compression-strategy" -> "compression",
      "write.orc.stripe-size-bytes" -> "1048576",
      "write.orc.block-size-bytes" -> "2097152",
      "write.orc.vectorized.batch-size" -> "512",
      "write.orc.bloom.filter.columns" -> "o_orderkey",
      "write.orc.bloom.filter.fpp" -> "0.01")
    val opts = WriteTuning.orcData(props)
    assert(opts("compression") == "snappy")
    assert(opts("orc.compression.strategy") == "COMPRESSION")
    assert(opts("orc.stripe.size") == "1048576")
    assert(opts("orc.block.size") == "2097152")
    assert(opts("orc.row.batch.size") == "512")
    assert(opts("orc.bloom.filter.columns") == "o_orderkey")
    assert(opts("orc.bloom.filter.fpp") == "0.01")
    // delete twins are independent (and never default to the data plane's)
    val dopts = WriteTuning.orcDelete(Map(
      "write.orc.compression-codec" -> "snappy",
      "write.delete.orc.compression-codec" -> "zstd",
      "write.delete.orc.stripe-size-bytes" -> "4096"))
    assert(dopts("compression") == "zstd")
    assert(dopts("orc.stripe.size") == "4096")
    assert(!dopts.contains("orc.bloom.filter.columns"))
    // container-asserted: the codec really lands in the ORC file footer
    val dir = java.nio.file.Files.createTempDirectory("orctune").toString + "/out"
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .limit(500).write.options(opts).orc(dir)
    val orcFile = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(java.nio.file.Paths.get(dir)).iterator.asScala
        .map(_.toString).find(_.endsWith(".orc")).get
    }
    val reader = org.apache.orc.OrcFile.createReader(
      new org.apache.hadoop.fs.Path(orcFile),
      org.apache.orc.OrcFile.readerOptions(new org.apache.hadoop.conf.Configuration()))
    assert(reader.getCompressionKind.name.equalsIgnoreCase("snappy"))
  }

  test("avro compression level threads to the container (and the delete twin)") {
    import graft.ice.write.WriteTuning
    assert(WriteTuning.avroDataCodec(Map(
      "write.avro.compression-codec" -> "gzip",
      "write.avro.compression-level" -> "9")) == ("deflate", "9"))
    assert(WriteTuning.avroDeleteCodec(Map(
      "write.avro.compression-codec" -> "zstd",
      "write.delete.avro.compression-codec" -> "gzip",
      "write.delete.avro.compression-level" -> "1")) == ("deflate", "1"))
    // container-asserted: level 9 compresses repetitive data tighter than
    // level 1, and the codec name lands in the container metadata
    val df = spark.range(0, 20000)
      .selectExpr("CAST(id % 7 AS STRING) AS v", "id % 13 AS k")
    def sizeAt(level: String): Long = {
      val dir = java.nio.file.Files.createTempDirectory(s"avrolvl$level").toString
      val written = graft.ice.manifest.AvroData
        .writeDirWithCounts(df.coalesce(1), dir, "deflate", level)
      val path = written.head._1
      val r = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
        new java.io.File(path),
        new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
      try assert(r.getMetaString("avro.codec") == "deflate") finally r.close()
      java.nio.file.Files.size(java.nio.file.Paths.get(path))
    }
    assert(sizeAt("9") < sizeAt("1"),
      "deflate level must change the produced container bytes")
  }

  test("unrecognized write.{delete,update,merge}.mode fails loudly, never CoW-fallback") {
    // a typo like 'mor' silently falling back to copy-on-write gives a
    // user full file rewrites while they believe they configured MoR
    import graft.ice.meta.TableProperties
    for (key <- Seq(TableProperties.WriteDeleteMode,
        TableProperties.WriteUpdateMode, TableProperties.WriteMergeMode)) {
      val e = intercept[IllegalArgumentException] {
        TableProperties.get(Map(key.name -> "mor"), key)
      }
      assert(e.getMessage.contains(key.name))
      assert(TableProperties.get(Map(key.name -> " merge-on-read "), key) ==
        "merge-on-read")
      assert(TableProperties.get(Map.empty, key) == "copy-on-write")
    }
  }
}
