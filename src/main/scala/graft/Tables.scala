package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ice._
import graft.ice.catalog._
import graft.ice.meta._
import graft.ice.transform._
import graft.ice.types._

/** Shared Iceberg-table fixtures for the driver contract: each testdata
  * parquet table is appended once into an Iceberg table in a per-SF temp
  * warehouse, and every SparkEntry query runs over the Iceberg-planned
  * scan while the DuckDB oracle runs on the raw parquet. This exercises
  * the full metadata/manifest/scan stack on every query. */
object Tables {

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, IceTable]()

  def warehouseDir(sfDir: String): String = {
    val tag = sfDir.replaceAll("[^a-zA-Z0-9]", "_")
    s"${System.getProperty("java.io.tmpdir")}/graft_wh$tag"
  }

  def catalog(sfDir: String): DirCatalog = new DirCatalog(warehouseDir(sfDir))

  /** Partition specs chosen for scale: facts partition on time (+bucket
    * for the biggest), dims stay unpartitioned. At 100 TB this is the
    * layout that keeps scans pruned and writes clustered. */
  private def specFor(name: String, schema: Schema): PartitionSpec = name match {
    case "lineitem" =>
      val sd = schema.findFieldByName("l_shipdate").get.id
      PartitionSpec(0, IndexedSeq(PartitionField(sd, 1000, "ship_month", MonthTransform)))
    case "orders" =>
      val od = schema.findFieldByName("o_orderdate").get.id
      PartitionSpec(0, IndexedSeq(PartitionField(od, 1000, "order_month", MonthTransform)))
    case "events" =>
      val ts = schema.findFieldByName("ts").get.id
      PartitionSpec(0, IndexedSeq(PartitionField(ts, 1000, "event_day", DayTransform)))
    case _ => PartitionSpec.unpartitioned
  }

  /** Load (building on first use) the Iceberg table for a testdata table. */
  def ice(spark: SparkSession, sfDir: String, name: String): IceTable = {
    val key = s"$sfDir/$name"
    cache.computeIfAbsent(key, { _ =>
      val cat = catalog(sfDir)
      val ident = TableIdentifier(Seq("tpch"), name)
      if (cat.tableExists(ident)) IceTable.load(cat, ident)
      else {
        val raw = spark.read.parquet(s"$sfDir/$name.parquet")
        val schema = SparkConv.fromSpark(raw.schema)
        val t = IceTable.create(cat, ident, schema, specFor(name, schema))
        t.append(spark).appendDataFrame(raw)
        t
      }
    })
  }

  /** The Iceberg-planned scan as a DataFrame. */
  def scan(spark: SparkSession, sfDir: String, name: String): DataFrame =
    ice(spark, sfDir, name).newScan().toDF(spark)

  /** Raw parquet (for operators where the table layer isn't under test). */
  def raw(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def reset(): Unit = cache.clear()
}
