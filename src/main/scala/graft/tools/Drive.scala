package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ice.transform._
import graft.ice.types._

/** Dev driver: exercises the public library surface against real testdata.
  * Usage: sbt "runMain graft.tools.Drive [sfDir]" */
object Drive {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-drive")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

    // bucket[8] on l_orderkey (long) — distributed UDF path
    val bucketed = li.withColumn("bkt",
      BucketTransform(8).toColumn(col("l_orderkey"), LongT))
    println("== bucket[8](l_orderkey) distribution:")
    bucketed.groupBy("bkt").count().orderBy("bkt").show(20, false)

    // cross-check: driver-side apply() must agree with the Column path
    val sample = bucketed.select("l_orderkey", "bkt").limit(50).collect()
    val mismatches = sample.count { r =>
      BucketTransform(8)(r.getLong(0), LongT) != r.getInt(1)
    }
    println(s"== driver-vs-executor bucket agreement on 50 rows: ${50 - mismatches}/50")

    // temporal transforms on l_shipdate (timestamp)
    val t = li.select(
      col("l_shipdate"),
      YearTransform.toColumn(col("l_shipdate"), TimestampT).as("yr"),
      MonthTransform.toColumn(col("l_shipdate"), TimestampT).as("mo"),
      DayTransform.toColumn(col("l_shipdate"), TimestampT).as("dy"),
      HourTransform.toColumn(col("l_shipdate"), TimestampT).as("hr"))
    println("== temporal transforms on l_shipdate:")
    t.show(5, false)
    val tr = t.limit(20).collect()
    val tMis = tr.count { r =>
      // testdata timestamps are TIMESTAMP_NTZ -> LocalDateTime
      val ldt = r.getAs[java.time.LocalDateTime](0)
      val us = ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
      YearTransform(us, TimestampT) != r.getInt(1) ||
        MonthTransform(us, TimestampT) != r.getInt(2) ||
        HourTransform(us, TimestampT) != r.getInt(4)
    }
    println(s"== driver-vs-executor temporal agreement on 20 rows: ${20 - tMis}/20")

    // truncate on a string col
    val tt = li.select(col("l_returnflag"),
      TruncateTransform(1).toColumn(col("l_returnflag"), StringT).as("tr1"),
      TruncateTransform(3).toColumn(lit("Hello, World!"), StringT).as("trs"))
    tt.show(3, false)

    // M5 surface: delete -> compact lifecycle on a real table
    import graft.ice._
    import graft.ice.catalog._
    import graft.ice.expr.{Expr => E}
    val wh = java.nio.file.Files.createTempDirectory("drive_wh").toString
    val cat = new DirCatalog(wh)
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val tbl = IceTable.create(cat, TableIdentifier.parse("db.orders"),
      SparkConv.fromSpark(orders.schema))
    tbl.append(spark).appendDataFrame(orders)
    tbl.append(spark).appendDataFrame(orders.limit(20)) // small file
    println(s"== files after 2 appends: ${tbl.newScan().planFiles().size}")
    tbl.delete(spark).deleteWherePositional(E.lt("o_orderkey", Literal.long(50)))
    val afterDelete = tbl.newScan().toDF(spark).count()
    println(s"== rows after MoR delete of o_orderkey<50: $afterDelete")
    tbl.compact(spark).rewriteDataFiles(targetFileSizeBytes = 64L * 1024 * 1024)
    val afterCompact = tbl.newScan().toDF(spark).count()
    println(s"== files after compaction: ${tbl.newScan().planFiles().size}, rows: $afterCompact (match=${afterDelete == afterCompact})")
    println(s"== snapshots: ${tbl.snapshots.map(_.operation.get).mkString(",")}")

    // versioned manifest writers: v1 and v3 write -> read through the
    // public ManifestAvro API
    import graft.ice.manifest._
    val mdir = java.nio.file.Files.createTempDirectory("drive_manifest").toString
    val pt = graft.ice.types.StructT(IndexedSeq(
      graft.ice.types.NestedField(1000, "b", graft.ice.types.IntT, required = false)))
    val ent = ManifestEntry(ManifestStatus.Added, None, None, None,
      DataFile(FileContent.Data, "/d/f.parquet", "PARQUET", IndexedSeq(1), 5, 100))
    for (v <- Seq(1, 2, 3)) {
      val mf = ManifestAvro.writeManifest(s"$mdir/m$v.avro", Seq(ent), pt, 0, 9L, 1L,
        formatVersion = v)
      val back = ManifestAvro.readManifest(s"$mdir/m$v.avro", pt, Some(mf))
      println(s"== manifest v$v round trip: entries=${back.size} snap=${back.head.snapshotId.orNull} part=${back.head.dataFile.partition}")
    }

    spark.stop()
    println("DRIVE OK")
  }
}
