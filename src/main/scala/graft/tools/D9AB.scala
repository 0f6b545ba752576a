package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** d9 bounded-spill A/B: run containmentPairs at the given pass counts
  * over `sfDir`'s documents table and print row count + an order-free
  * checksum per arm, plus wall seconds — the evidence that the
  * sequential hash-range schedule is bit-equal to the single-pass join
  * at decade scale and what each arm costs.
  *
  * Usage: D9AB <sfDir> [passesCsv=1,4] [mem notes via SPARK_DRIVER_MEM]
  */
object D9AB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/testdata/sf1")
    val passList = args.lift(1).getOrElse("1,4")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    passList.foreach { p =>
      val t0 = System.nanoTime()
      val out = graft.ops.Dedup.containmentPairs(
          docs, "text", "doc_id", "lang", postingPasses = p)
        .agg(count(lit(1)).as("n"),
          // order-free pair-set checksum: xor of per-row hashes
          // (overflow-free under ANSI, order-insensitive)
          expr("bit_xor(xxhash64(id_a, id_b, containment))").as("checksum"))
        .head
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"d9 passes=$p%-3d rows=${out.getLong(0)}%-10d " +
        f"checksum=${out.getLong(1)}%-22d sec=$sec%.1f")
    }
    spark.stop()
  }
}
