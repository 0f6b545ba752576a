package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame) = df.write.format("noop").mode("overwrite").save()
    val rawOrders = spark.read.parquet(s"$sfDir/orders.parquet")
    time("raw orders count")(rawOrders.count())
    time("raw orders noop")(noop(rawOrders))
    time("raw + day transform noop")(noop(rawOrders.select(
      graft.ice.transform.DayTransform.toColumn(col("o_orderdate"), graft.ice.types.TimestampT).as("d"), col("o_orderkey"))))
    time("raw + datediff direct noop")(noop(rawOrders.select(
      datediff(col("o_orderdate").cast("date"), lit(java.sql.Date.valueOf("1970-01-01"))).as("d"), col("o_orderkey"))))
    val ice = graft.Tables.scan(spark, sfDir, "orders")
    time("ice orders noop 1st")(noop(ice))
    time("ice orders noop 2nd")(noop(graft.Tables.scan(spark, sfDir, "orders")))
    time("ice + day transform noop")(noop(graft.Tables.scan(spark, sfDir, "orders").select(
      graft.ice.transform.DayTransform.toColumn(col("o_orderdate"), graft.ice.types.TimestampT).as("d"), col("o_orderkey"))))
    println("ice scan partitions: " + graft.Tables.scan(spark, sfDir, "orders").rdd.getNumPartitions)
    println("files: " + graft.Tables.ice(spark, sfDir, "orders").newScan().planFiles().size)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    time("raw window_rank noop")(noop(rawOrders.withColumn("rk", row_number().over(w)).filter(col("rk")<=2).select("o_custkey","o_orderkey","rk")))
    time("ice window_rank noop")(noop(graft.Tables.scan(spark, sfDir, "orders").withColumn("rk", row_number().over(w)).filter(col("rk")<=2).select("o_custkey","o_orderkey","rk")))
    spark.stop()
  }
}
