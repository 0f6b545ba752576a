package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ice.manifest.AvroData

/** S9 Avro source/sink: the distributed read path must run as Spark
  * tasks over the executors, not a driver-side row materialization. */
class AvroDataSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("multi-file writeDir/readDir round-trip runs the read as Spark tasks") {
    val dir = java.nio.file.Files.createTempDirectory("avro_rt").toString
    val df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select("c_custkey", "c_name", "c_acctbal")
      .repartition(4)
    val files = AvroData.writeDir(df, dir)
    assert(files.size > 1, s"expected multiple files, got ${files.size}")

    val back = AvroData.readDir(spark, dir, df.schema)
    // distributed: the plan scans an RDD, not a driver-built local relation
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD") || plan.contains("Scan ExistingRDD"), plan)
    assert(!plan.contains("LocalTableScan"), plan)
    // and the read is file-parallel: as many input partitions as files
    assert(back.rdd.getNumPartitions >= math.min(files.size, 4))

    assert(back.count() == df.count())
    val a = back.orderBy("c_custkey").collect().map(_.toSeq)
    val b = df.orderBy("c_custkey").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("empty directory reads as empty frame with the requested schema") {
    val dir = java.nio.file.Files.createTempDirectory("avro_empty").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("x",
        org.apache.spark.sql.types.LongType)))
    val back = AvroData.readDir(spark, dir, schema)
    assert(back.count() == 0)
    assert(back.schema == schema)
  }

  test("one large Avro file splits on sync markers and reads complete in parallel") {
    val dir = java.nio.file.Files.createTempDirectory("avro_split").toString
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val files = AvroData.writeDir(df.coalesce(1), dir) // ONE file
    assert(files.size == 1)
    val len = java.nio.file.Files.size(java.nio.file.Paths.get(files.head))
    val splitSize = math.max(1L, len / 7) // force ~7 ranges
    val back = AvroData.readFiles(spark, files, df.schema, splitSizeBytes = splitSize)
    assert(back.rdd.getNumPartitions > 1, "expected a multi-split read")
    assert(back.count() == df.count(), "sync-split read lost or duplicated blocks")
    assert(back.agg(org.apache.spark.sql.functions.sum("o_orderkey")).head.getLong(0) ==
      df.agg(org.apache.spark.sql.functions.sum("o_orderkey")).head.getLong(0))
  }

  test("property: any split size preserves the row multiset") {
    val dir = java.nio.file.Files.createTempDirectory("avro_prop").toString
    val df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select("c_custkey", "c_name")
    val files = AvroData.writeDir(df.coalesce(1), dir)
    val len = java.nio.file.Files.size(java.nio.file.Paths.get(files.head))
    val expected = df.count()
    val expectedSum = df.agg(org.apache.spark.sql.functions.sum("c_custkey")).head.getLong(0)
    // sweep split sizes incl. pathological ones (1 byte, larger than file)
    for (split <- Seq(1L, 64L, 1024L, len / 3, len / 2, len - 1, len, len + 100)) {
      val back = AvroData.readFiles(spark, files, df.schema, splitSizeBytes = split)
      assert(back.count() == expected, s"splitSize=$split lost/duplicated rows")
      assert(back.agg(org.apache.spark.sql.functions.sum("c_custkey")).head.getLong(0)
        == expectedSum, s"splitSize=$split corrupted values")
    }
  }

  test("field-id resolution survives a rename between write and read") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("avro_ids").toString
    def meta(id: Int) = new MetadataBuilder().putLong("parquet.field.id", id.toLong).build()
    val writeSchema = StructType(Seq(
      StructField("old_name", LongType, nullable = true, meta(1)),
      StructField("stable", StringType, nullable = true, meta(2))))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(10L, "a"),
        org.apache.spark.sql.Row(20L, "b")), writeSchema)
    AvroData.writeDir(df, dir)
    // read with a RENAMED field (same field id) + a brand-new field
    val readSchema = StructType(Seq(
      StructField("new_name", LongType, nullable = true, meta(1)),
      StructField("stable", StringType, nullable = true, meta(2)),
      StructField("added", DoubleType, nullable = true, meta(3))))
    val back = AvroData.readDir(spark, dir, readSchema).orderBy("new_name").collect()
    assert(back.map(_.getLong(0)).toSeq == Seq(10L, 20L)) // resolved by id
    assert(back.map(_.getString(1)).toSeq == Seq("a", "b"))
    assert(back.forall(_.isNullAt(2))) // absent field -> null
  }

  test("id-less files resolve through the name mapping before current names") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("avro_nm").toString
    // file written WITHOUT field ids, under the original column names
    val fileSchema = StructType(Seq(
      StructField("legacy_key", LongType, nullable = true),
      StructField("val", StringType, nullable = true)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, "x"),
        org.apache.spark.sql.Row(2L, "y")), fileSchema)
    AvroData.writeDir(df, dir)
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().asScala.map(_.toString).filter(_.endsWith(".avro")).toSeq
    // table schema renamed legacy_key -> k; the name mapping carries the
    // old spelling (schema.name-mapping.default semantics)
    def meta(id: Int) = new MetadataBuilder().putLong("parquet.field.id", id.toLong).build()
    val readSchema = StructType(Seq(
      StructField("k", LongType, nullable = true, meta(1)),
      StructField("val", StringType, nullable = true, meta(2))))
    val mapping = Map(1L -> Seq("legacy_key"), 2L -> Seq("val"))
    val back = AvroData.readFiles(spark, files, readSchema, mappedNames = mapping)
      .orderBy("k").collect()
    assert(back.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(back.map(_.getString(1)).toSeq == Seq("x", "y"))
    // without the mapping the renamed column cannot resolve -> null
    val bare = AvroData.readFiles(spark, files, readSchema).collect()
    assert(bare.forall(_.isNullAt(0)))
  }

  test("timestamp/date/binary values survive the executor-side decode") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("avro_types").toString
    val df = Seq(
      (1L, java.sql.Date.valueOf("2024-03-01"), Array[Byte](1, 2, 3)),
      (2L, java.sql.Date.valueOf("1999-12-31"), Array[Byte](9))
    ).toDF("id", "d", "b")
    AvroData.writeDir(df.repartition(2), dir)
    val back = AvroData.readDir(spark, dir, df.schema).orderBy("id").collect()
    assert(back(0).getDate(1) == java.sql.Date.valueOf("2024-03-01"))
    assert(back(1).getDate(1) == java.sql.Date.valueOf("1999-12-31"))
    assert(back(0).getAs[Array[Byte]](2).toSeq == Seq[Byte](1, 2, 3))
  }

  test("utf8Compare orders like unsigned UTF-8 bytes (supplementary plane)") {
    import java.nio.charset.StandardCharsets.UTF_8
    def byteOrder(a: String, b: String): Int =
      java.util.Arrays.compareUnsigned(a.getBytes(UTF_8), b.getBytes(UTF_8))
    // the divergence case: Java String order puts U+10000+ (surrogate
    // pairs, 0xD800-range units) BELOW U+E000..U+FFFF; UTF-8 byte order
    // puts them above
    val supp = new String(Character.toChars(0x10400)) // U+10400
    val bmpHigh = "�"                            // U+FFFD
    assert(supp.compareTo(bmpHigh) < 0, "sanity: UTF-16 order disagrees")
    val cases = Seq(
      ("a", "b"), ("abc", "abd"), ("abc", "abcd"), ("", "a"),
      (supp, bmpHigh), (bmpHigh, supp), (s"p/$supp", s"p/$bmpHigh"),
      ("", supp), (supp, supp), ("café", "cafe"), ("ÿ", "Ā"))
    cases.foreach { case (a, b) =>
      assert(Integer.signum(graft.ice.manifest.AvroData.utf8Compare(a, b)) ==
        Integer.signum(byteOrder(a, b)), s"order('$a','$b')")
    }
  }
}
