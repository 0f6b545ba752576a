package graft.tools

import org.apache.spark.sql.SparkSession

/** Split-planning A/B probe (sibling of CodecAB/ScanAB): measures one V2
  * grouped-agg scan over an existing warehouse table with the table's
  * CURRENT read.split.* settings vs splitting/packing DISABLED, printing
  * warm times and task counts — attributes a flagged scan regression to
  * the split planner (plan change) vs everything else (host/code).
  * Usage: runjava.sh graft.tools.SplitAB <sfDir> [ns.table] [runs] */
object SplitAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/testdata/sf1")
    val ident = if (args.length > 1) args(1) else "catq.orders_v2dml"
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val warehouse = graft.Tables.warehouseDir(sfDir)
    spark.conf.set("spark.sql.catalog.ice", "graft.ice.connector.GraftCatalogPlugin")
    spark.conf.set("spark.sql.catalog.ice.warehouse", warehouse)
    val cat = new graft.ice.catalog.DirCatalog(warehouse)
    val tid = graft.ice.catalog.TableIdentifier.parse(ident)

    def setProps(ps: Map[String, String], drop: Seq[String]): Unit =
      graft.ice.IceTable.load(cat, tid).commit(b =>
        b.copy(properties = b.properties ++ ps -- drop))

    def measure(label: String): Int = {
      val df = spark.sql(
        s"""SELECT o_orderpriority, count(*) AS n,
           |  round(sum(o_totalprice), 2) AS revenue
           |FROM ice.$ident GROUP BY o_orderpriority""".stripMargin)
      val parts = spark.table(s"ice.$ident").rdd.getNumPartitions
      for (i <- 1 to runs) {
        val t0 = System.nanoTime()
        df.collect()
        println(f"$label run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s (scan tasks: $parts)")
      }
      parts
    }

    measure("A(current split props)")
    // genuinely disable planning: a huge target alone is not enough (it
    // must also not PACK everything into one bin) — open-file-cost equal
    // to the target makes every split seal its own bin, so the B arm is
    // exactly one task per data file
    setProps(Map(
      "read.split.target-size" -> Long.MaxValue.toString,
      "read.split.open-file-cost" -> Long.MaxValue.toString,
      "read.split.adaptive-size.enabled" -> "false"), Nil)
    val bTasks = measure("B(split planning off)")
    val fileCount = graft.ice.IceTable.load(cat, tid).newScan().planFiles().size
    println(s"B tasks=$bTasks, data files=$fileCount")
    assert(bTasks == fileCount,
      s"B arm must be one task per file ($bTasks tasks vs $fileCount files)")
    setProps(Map.empty, Seq("read.split.target-size",
      "read.split.open-file-cost", "read.split.adaptive-size.enabled"))
    spark.stop()
  }
}
