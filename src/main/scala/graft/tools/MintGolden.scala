package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Mint (or re-verify) a golden VALUES oracle for a hash-defined driver
  * query: runs `SparkEntry.queries(name)` at the given sfDir and prints
  * the sorted result set in the `GoldenOracles` row-literal format.
  *
  * Environment-sensitivity check built in: run with different
  * MINT_MASTER / MINT_SHUFFLE / MINT_SPLIT_BYTES settings — a query is
  * safe to pin only if every run prints identical rows.
  *
  * Usage: sbt "runMain graft.tools.MintGolden <query> [sfDir]" */
object MintGolden {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      throw new IllegalArgumentException("usage: MintGolden <query> [sfDir]"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("MINT_MASTER", "local[32]"))
      .appName("graft-mint")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("MINT_SHUFFLE", "32"))
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("MINT_SPLIT_BYTES", (128L * 1024 * 1024).toString))
      .config("spark.default.parallelism", sys.env.getOrElse("MINT_PARALLELISM", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val cols = df.columns
      val rows = df.collect().map { r =>
        cols.indices.map { i =>
          r.get(i) match {
            case null => "NULL"
            case s: String => "'" + s.replace("'", "''") + "'"
            case d: java.math.BigDecimal => d.toPlainString
            case other => other.toString
          }
        }.mkString("(", ", ", ")")
      }.sorted
      println(s"== $name: ${rows.length} rows, cols=${cols.mkString(",")}")
      rows.grouped(8).foreach(g => println("\"" + g.mkString(", ") + "\","))
    } finally spark.stop()
  }
}
