package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: pure parquet scan cost over the CodecAB tables' data dirs —
  * no MoR machinery, isolates codec read cost by column set. */
object ScanAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/testdata/sf30")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = graft.Tables.warehouseDir(sfDir)
    def dataDir(t: String) = {
      val d = new java.io.File(s"$wh/tpch/$t/data")
      d.listFiles.filter(f => f.isDirectory && !f.getName.endsWith("-deletes"))
        .map(_.getAbsolutePath)
    }
    for (r <- 1 to 3; t <- Seq("ab_orders_zstd", "ab_orders_snappy")) {
      val dirs = dataDir(t)
      var t0 = System.nanoTime()
      spark.read.parquet(dirs: _*)
        .agg(sum(length(concat_ws(",", col("o_orderstatus"), col("o_orderdate").cast("string")))))
        .collect()
      val full = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      spark.read.parquet(dirs: _*)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .write.format("noop").mode("overwrite").save()
      val narrow = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      spark.read.parquet(dirs: _*)
        .select(col("_metadata.row_index").as("p"), col("o_orderkey"))
        .write.format("noop").mode("overwrite").save()
      val meta = (System.nanoTime() - t0) / 1e9
      println(f"$t run $r: comment-scan=$full%.2f narrow=$narrow%.2f rowidx=$meta%.2f")
    }
    spark.stop()
  }
}
