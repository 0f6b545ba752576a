package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query names (local debugging only;
    // the driver always passes exactly two args)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      if (unknown.nonEmpty)
        System.err.println(s"[verify] WARNING: filter names not in " +
          s"SparkEntry.queries (will run nothing for them): ${unknown.toSeq.sorted.mkString(",")}")
      System.err.println(s"[verify] WARNING: filtered run — $outDir is " +
        "PARTIAL/STALE for unfiltered queries; do not use it for a full driver compare")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.cleaner.periodicGC.interval", "1min")
      // see Bench.scala: keep the JVM-global state-store maintenance
      // timer from firing during shutdown
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "6h")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // per-query cache scope: each query's intra-query persists die with
      // it, and releasing them can never touch another query's caches
      val (dfOrErr, scope) = graft.ops.Caches.scoped {
        try Right(fn(spark, sfDir)) catch { case e: Throwable => Left(e) }
      }
      try dfOrErr match {
        case Right(df) => df.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        case Left(e) =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      finally { scope.release(); graft.ops.Caches.release() }
      // shared-session hygiene gate: Verify runs the whole suite in ONE
      // session, so any persist that survives its query is a storage-
      // memory leak that degrades every later query. The CacheManager
      // must be empty between queries; SPARK_GRAFT_ASSERT_CLEAN=1
      // escalates the warning to a failure (CI-fashion replay).
      if (!spark.sharedState.cacheManager.isEmpty) {
        val msg = s"[verify] CACHE LEAK after $name: cacheManager non-empty"
        if (sys.env.contains("SPARK_GRAFT_ASSERT_CLEAN"))
          throw new IllegalStateException(msg)
        System.err.println(msg)
        spark.sharedState.cacheManager.clearCache()
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // session-computed oracles (d10's centroid recompute) win over any
    // static entry; a failure degrades that query to rows-only rather
    // than breaking the whole dump
    val dynamic =
      try SparkEntry.dynamicOracleSql(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[verify] dynamic oracle generation failed: ${e.getMessage}")
        Map.empty[String, String]
      }
    val json = (SparkEntry.oracleSql ++ dynamic)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.streams.active.foreach(q => try q.stop() catch { case _: Throwable => () })
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
  }
}
