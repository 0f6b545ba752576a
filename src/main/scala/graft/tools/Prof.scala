package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Ad-hoc stage profiler (scratch tool; currently: d7 stage breakdown). */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/testdata/sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()

    val docs = graft.Tables.scan(spark, sfDir, "documents")
    time("docs scan")(noop(docs))
    val sh = Dedup.shingleSets(docs, "text", "doc_id", "lang", 3)
    time("shingleSets")(noop(sh))
    time("shingleSets 2nd")(noop(sh))
    val postings = sh.select(col("__blk"), col("__id"),
      size(col("__sh")).cast("long").as("__n"), explode(col("__sh")).as("__s"))
    time("postings")(noop(postings))
    val freq = postings.groupBy("__s").agg(count(lit(1)).as("__f"))
      .filter(col("__f") > 1)
    time("freq agg")(println("  hot shingles: " + freq.count()))
    val cands = Dedup.jaccardCandidates(sh, 4, 5)
    time("candidates")(println("  candidate pairs: " + cands.count()))
    val d7 = Dedup.jaccardExactPairs(docs, "text", "doc_id", "lang")
    time("full d7")(println("  result pairs: " + d7.count()))

    // d3 (minhash-LSH near-dup) breakdown
    val sig = Dedup.minhashSignatures(docs, "text", "doc_id", 16, 3)
    time("minhash signatures")(noop(sig))
    val buckets = Dedup.lshBuckets(sig, "doc_id", 8, 2)
    time("lsh buckets")(noop(buckets))
    val lshCands = Dedup.lshCandidatePairs(buckets, "doc_id")
    time("lsh candidates")(println("  lsh candidate pairs: " + lshCands.count()))
    val d3 = Dedup.nearDupPairs(docs, "text", "doc_id",
      threshold = 0.2, k = 16, bands = 8)
    time("full d3")(println("  d3 pairs: " + d3.count()))
    spark.stop()
  }
}
