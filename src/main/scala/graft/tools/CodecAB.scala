package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch A/B: the del_mor_position MoR scan over two otherwise
  * identical orders tables, one zstd one snappy — isolates the declared
  * default-codec change from host/code drift.
  * Usage: CodecAB <sfDir> [runs] */
object CodecAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/testdata/sf30")
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ice._
    import graft.ice.catalog._
    import graft.ice.expr.{Expr => E}
    import graft.ice.types.SparkConv

    val cat = graft.Tables.catalog(sfDir)
    val raw = graft.Tables.raw(spark, sfDir, "orders")
    def build(name: String, codec: String): IceTable = {
      val ident = TableIdentifier(Seq("tpch"), name)
      if (cat.tableExists(ident)) IceTable.load(cat, ident)
      else {
        val t = IceTable.create(cat, ident, SparkConv.fromSpark(raw.schema),
          properties = Map(
            "write.parquet.compression-codec" -> codec,
            "write.delete.parquet.compression-codec" -> codec))
        t.append(spark).appendDataFrame(raw)
        t.delete(spark).deleteWherePositional(
          E.equal("o_orderstatus", graft.ice.types.Literal.string("F"))
            .and(E.raw("o_orderkey % 3 = 0")))
        t
      }
    }
    val zstd = build("ab_orders_zstd", "zstd")
    val snappy = build("ab_orders_snappy", "snappy")
    for (r <- 1 to runs; (label, t) <- Seq("zstd" -> zstd, "snappy" -> snappy)) {
      val t0 = System.nanoTime()
      t.newScan().toDF(spark)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .write.format("noop").mode("overwrite").save()
      println(f"$label run $r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
