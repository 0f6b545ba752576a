package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ice._
import graft.ice.catalog._
import graft.ice.types.SparkConv

/** Arrow columnar export of scans (reference flagship interop path,
  * table_scan.cc:120-134 MakeArrowArrayStream): a scan round-trips
  * through serialized Arrow batches / a full IPC stream and matches the
  * DataFrame result exactly. */
class ArrowExportSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sfDir = "/root/testdata/sf0.001"

  private def fixture(): (IceTable, org.apache.spark.sql.DataFrame) = {
    val cat = new DirCatalog(java.nio.file.Files.createTempDirectory("wharr").toString)
    val raw = spark.read.parquet(s"$sfDir/orders.parquet")
    val t = IceTable.create(cat, TableIdentifier.parse("db.arrow"),
      SparkConv.fromSpark(raw.schema))
    t.append(spark).appendDataFrame(raw)
    (t, raw)
  }

  test("scan -> Arrow batches -> DataFrame round-trips exactly") {
    val (t, _) = fixture()
    val scan = t.newScan()
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      .filter(graft.ice.expr.Expr.raw("o_orderkey < 2000"))
    val df = scan.toDF(spark)
    val batches = scan.toArrowBatchRdd(spark).collect()
    assert(batches.nonEmpty && batches.forall(_.nonEmpty))
    val back = org.apache.spark.sql.GraftArrowBridge.fromBatches(
      spark, df.schema.json, batches.iterator)
    assert(back.schema == df.schema)
    def key(r: org.apache.spark.sql.Row) = r.getLong(0)
    val a = df.collect().sortBy(key).map(_.toSeq).toSeq
    val b = back.collect().sortBy(key).map(_.toSeq).toSeq
    assert(a == b, s"round-trip altered rows (${a.size} vs ${b.size})")
  }

  test("writeArrowIpcFiles exports per-task IPC files with no driver materialization") {
    // multi-split fixture: several appends -> several files -> several
    // scan splits; every task writes its own .arrows file
    val cat = new DirCatalog(java.nio.file.Files.createTempDirectory("wharrd").toString)
    val raw = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val t = IceTable.create(cat, TableIdentifier.parse("db.arrowd"),
      SparkConv.fromSpark(raw.schema))
    t.append(spark).appendDataFrame(raw.repartition(3))
    t.append(spark).appendDataFrame(raw.limit(100).repartition(2))
    assert(t.newScan().planFiles().size >= 2, "fixture must be multi-split")

    val outDir = java.nio.file.Files.createTempDirectory("arrowout").toString
    val files = t.newScan().select("o_orderkey", "o_custkey")
      .writeArrowIpcFiles(spark, outDir)
    assert(files.size >= 2, s"expected one file per task, got $files")
    assert(files.forall(_._2 >= 1), "every written file carries batches")

    // each file is an INDEPENDENTLY consumable IPC stream: read every one
    // with the arrow-vector reader and re-aggregate
    val alloc = new org.apache.arrow.memory.RootAllocator()
    var rows = 0L
    var keySum = 0L
    try files.foreach { case (path, _) =>
      val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(
        graft.ice.manifest.ManifestAvro.stripFileScheme(path)))
      val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(in, alloc)
      try {
        assert(reader.getVectorSchemaRoot.getSchema.getFields.size == 2)
        while (reader.loadNextBatch()) {
          val root = reader.getVectorSchemaRoot
          val kv = root.getVector(0)
            .asInstanceOf[org.apache.arrow.vector.BigIntVector]
          (0 until root.getRowCount).foreach(i => keySum += kv.get(i))
          rows += root.getRowCount
        }
      } finally { reader.close(); in.close() }
    } finally alloc.close()
    assert(rows == raw.count() + 100)
    val expectSum = t.newScan().toDF(spark)
      .selectExpr("CAST(sum(o_orderkey) AS BIGINT)").head.getLong(0)
    assert(keySum == expectSum, "column values must survive the per-task IPC trip")
  }

  test("writeArrowStream emits a complete IPC stream pyarrow-shaped readers parse") {
    val (t, raw) = fixture()
    val out = new java.io.ByteArrayOutputStream()
    t.newScan().select("o_orderkey", "o_orderstatus").writeArrowStream(spark, out)
    val bytes = out.toByteArray
    assert(bytes.nonEmpty)
    // parse with the arrow-vector IPC reader (the same library any
    // external JVM consumer would use)
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new java.io.ByteArrayInputStream(bytes), alloc)
    try {
      val schema = reader.getVectorSchemaRoot.getSchema
      assert(schema.getFields.size == 2)
      assert(schema.getFields.get(0).getName == "o_orderkey")
      var rows = 0L
      var keySum = 0L
      while (reader.loadNextBatch()) {
        val root = reader.getVectorSchemaRoot
        val kv = root.getVector(0)
          .asInstanceOf[org.apache.arrow.vector.BigIntVector]
        (0 until root.getRowCount).foreach(i => keySum += kv.get(i))
        rows += root.getRowCount
      }
      assert(rows == raw.count())
      val expectSum = raw.selectExpr("CAST(sum(o_orderkey) AS BIGINT)")
        .head.getLong(0)
      assert(keySum == expectSum, "column values must survive the IPC trip")
    } finally { reader.close(); alloc.close() }
  }
}
