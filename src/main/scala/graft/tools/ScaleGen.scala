package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for scale-stress benchmarking: replicates a
  * driver-generated testdata directory N× with key shifting, preserving
  * referential integrity (orders.o_custkey references the shifted
  * customer replica, lineitem references shifted orders/part/supplier)
  * so join/agg plans scale the way real data growth would.
  *
  * documents.text gets a per-replica INJECTIVE token rename (every word
  * suffixed `_rN`): an alphabet renaming preserves every within-replica
  * set relation exactly (shingle sets, jaccard, minhash collision
  * structure, token counts), while replica i and j share no token at
  * all — cross-replica jaccard is 0, so dedup outputs scale exactly
  * linearly in the replica count. (A first attempt interspersed a salt
  * token BETWEEN words; that creates bridge shingles `rN w rN` shared
  * by any two same-replica docs with one common word, which inflates
  * low-threshold near-dup pair counts ~800x. Renaming has no such
  * artifact.)
  *
  * Usage: ScaleGen <srcSfDir> <dstDir> <copies> [onlyTable]
  * (e.g. /root/testdata/sf0.1 /tmp/testdata/sf1 10) */
object ScaleGen {

  def main(args: Array[String]): Unit = {
    val (src, dst, copies) = (args(0), args(1), args(2).toInt)
    val only = args.lift(3)
    def want(name: String): Boolean = only.forall(_ == name)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dst))

    def read(name: String) = spark.read.parquet(s"$src/$name.parquet")
    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head.getLong(0) + 1
    val reps = spark.range(copies.toLong).select(col("id").as("__rep"))
    // replicate df `copies`x, shifting each key column by rep*stride
    def replicate(df: DataFrame, shifts: Map[String, Long],
        keepRep: Boolean = false): DataFrame = {
      val cols = df.columns.map { c =>
        shifts.get(c) match {
          case Some(stride) => (col(c) + col("__rep") * stride).as(c)
          case None => col(c)
        }
      } ++ (if (keepRep) Seq(col("__rep")) else Nil)
      df.crossJoin(broadcast(reps)).select(cols.toSeq: _*)
    }
    // single flat file per table, like the driver layout (the streaming
    // queries glob `events.parquet` as a FILE name; scans still
    // parallelize over row groups)
    def write(df: DataFrame, name: String): Unit = {
      if (!want(name)) return
      val tmp = s"$dst/.__$name"
      // 16 MB row groups keep the single file splittable 32+ ways
      df.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", (16L * 1024 * 1024).toString)
        .parquet(tmp)
      import scala.jdk.CollectionConverters._
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        .iterator.asScala.map(_.toString).filter(_.endsWith(".parquet")).toSeq.head
      java.nio.file.Files.move(java.nio.file.Paths.get(part),
        java.nio.file.Paths.get(s"$dst/$name.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      java.nio.file.Files.list(java.nio.file.Paths.get(tmp)).iterator.asScala
        .foreach(p => java.nio.file.Files.delete(p))
      java.nio.file.Files.delete(java.nio.file.Paths.get(tmp))
      println(s"[scalegen] $name: ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }

    // dimensions stay fixed
    for (d <- Seq("region", "nation")) write(read(d), d)

    val cust = read("customer"); val custStride = maxOf(cust, "c_custkey")
    val supp = read("supplier"); val suppStride = maxOf(supp, "s_suppkey")
    val part = read("part"); val partStride = maxOf(part, "p_partkey")
    val ord = read("orders"); val ordStride = maxOf(ord, "o_orderkey")
    write(replicate(cust, Map("c_custkey" -> custStride)), "customer")
    write(replicate(supp, Map("s_suppkey" -> suppStride)), "supplier")
    write(replicate(part, Map("p_partkey" -> partStride)), "part")
    write(replicate(ord, Map(
      "o_orderkey" -> ordStride, "o_custkey" -> custStride)), "orders")
    write(replicate(read("lineitem"), Map(
      "l_orderkey" -> ordStride, "l_partkey" -> partStride,
      "l_suppkey" -> suppStride)), "lineitem")

    // events.ts has shipped as TIMESTAMP(NANOS) (readable only as long)
    // and as TIMESTAMP(MICROS) across testdata generations; nanosAsLong
    // lets either read, and the scaled file keeps the source's physical
    // type — every consumer normalizes through Events.normalizeTs
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = read("events")
    write(replicate(ev, Map(
      "event_id" -> maxOf(ev, "event_id"), "user_id" -> maxOf(ev, "user_id"))),
      "events")

    val docs = read("documents")
    val salted = replicate(docs, Map("doc_id" -> maxOf(docs, "doc_id")),
        keepRep = true)
      .withColumn("text",
        regexp_replace(col("text"), lit("(\\w+)"),
          concat(lit("$1_r"), col("__rep").cast("string"))))
      .drop("__rep")
    write(salted.withColumn("n_chars", length(col("text")).cast("long")),
      "documents")

    // embeddings get a per-replica deterministic ±1 sign flip per
    // dimension (replica 0 = identity). A diagonal ±1 matrix is
    // orthogonal: every within-replica cosine is preserved EXACTLY
    // (negation is exact in IEEE float), while cross-replica pairs
    // decorrelate to the corpus noise floor — scaling adds NEW vectors
    // instead of exact clones. (Verbatim replication makes every
    // vector's dup cluster grow with the copy count, so near-dup PAIR
    // output grows as C(copies,2) per source vector — quadratic by
    // construction, ~10.8M pairs at 100 copies — which benchmarks the
    // fixture, not the engine.)
    val emb = read("embeddings")
    val embScaled = replicate(emb, Map("vec_id" -> maxOf(emb, "vec_id")),
        keepRep = true)
      .withColumn("embedding",
        when(col("__rep") === 0, col("embedding")).otherwise(
          zip_with(col("embedding"),
            sequence(lit(0), size(col("embedding")) - 1),
            (x, i) => when(pmod(xxhash64(col("__rep"), i), lit(2)) === 0, x)
              .otherwise(-x))))
      .drop("__rep")
    write(embScaled, "embeddings")

    println(s"[scalegen] DONE -> $dst (${copies}x $src)")
    spark.stop()
  }
}
