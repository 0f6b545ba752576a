package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ice.FileListRelation

/** The 100-TB planning claim behind ManifestFileIndex: a scan over very
  * many files must not turn the driver plan into a million-string path
  * list (the InMemoryFileIndex failure mode of `parquet(paths:_*)`) nor
  * issue one filesystem stat per path. The index is fed (path, length)
  * straight from manifest metadata, so both costs are zero by
  * construction — this spec pins the observable consequences at 100k
  * files: sub-second relation construction, a plan that carries the
  * index summary instead of the paths, split packing into a bounded
  * task count, and a correct full read. */
class FileListScaleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("100k-file scan plans flat and reads correctly") {
    val path = "/root/testdata/sf0.001/region.parquet"
    val len = java.nio.file.Files.size(java.nio.file.Paths.get(path))
    val nFiles = 100000
    val files = (0 until nFiles).map(_ => (path, len))

    val t0 = System.nanoTime()
    val df = FileListRelation.parquet(spark, files,
      spark.read.parquet(path).schema)
    val plan = df.queryExecution.executedPlan
    val planStr = plan.toString
    val planMs = (System.nanoTime() - t0) / 1000000
    // planning is metadata-only: no stat calls, no path-list plan object
    assert(planMs < 10000, s"planning 100k files took ${planMs}ms")
    // the FileScan's Location renders the index class and its (empty)
    // rootPaths — not one string per file
    assert(planStr.contains("ManifestFileIndex"), planStr.take(1500))
    assert(planStr.length < 20000,
      s"plan string ballooned to ${planStr.length} chars")

    // split packing: openCostInBytes batches small files into few tasks,
    // not one task per file
    val parts = df.rdd.getNumPartitions
    assert(parts < nFiles / 10, s"no split packing: $parts partitions")

    // and the read is real: every listed file is scanned
    val rows = spark.read.parquet(path).count()
    assert(df.count() == rows * nFiles)
  }
}
