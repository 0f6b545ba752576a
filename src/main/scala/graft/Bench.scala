package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR (default sf0.1) and prints one JSON line.
  *
  * Two passes: an untimed warm-up that builds the Iceberg tables /
  * fixtures and primes the JVM, then a timed pass. Queries are forced
  * with a noop write so the full plan executes (a bare count() lets
  * Spark shortcut scans via parquet row-group metadata). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(name: String): Either[String, Unit] =
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        Right(())
      } catch { case e: Throwable => Left(e.getMessage) }

    val names = SparkEntry.queries.keys.toSeq.sorted
    // warm-up (builds Iceberg tables + fixtures; untimed)
    names.foreach(force)

    val results = names.map { name =>
      val t0 = System.nanoTime()
      val ok = force(name)
      val sec = (System.nanoTime() - t0) / 1e9
      ok match {
        case Right(_) => name -> sec
        case Left(_) => name -> -1.0
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
