package graft

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
}
