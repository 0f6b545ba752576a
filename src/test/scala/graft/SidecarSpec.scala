package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

/** Snapshot-keyed dedup sidecars: one computation per (snapshot, params),
  * invalidated by ANY key change (snapshot advance, param change), and
  * bit-identical results from the cached artifact. */
class SidecarSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("sidecar").toString

  test("sidecar computes once per key and recomputes on key change") {
    import spark.implicits._
    val path = tmpDir() + "/artifact"
    val computes = new AtomicInteger(0)
    def run(key: String): Set[Long] =
      Sidecar.dataFrame(spark, Some(key), Some(path)) {
        computes.incrementAndGet()
        Seq(1L, 2L, 3L).toDF("x")
      }.collect().map(_.getLong(0)).toSet

    assert(run("uuid:snap1") == Set(1L, 2L, 3L))
    assert(computes.get() == 1)
    // same key: served from the artifact, compute not re-entered
    assert(run("uuid:snap1") == Set(1L, 2L, 3L))
    assert(computes.get() == 1)
    // snapshot advanced: key differs -> recompute (and re-key)
    assert(run("uuid:snap2") == Set(1L, 2L, 3L))
    assert(computes.get() == 2)
    // back to an OLD key: the artifact is keyed to snap2 now -> recompute
    assert(run("uuid:snap1") == Set(1L, 2L, 3L))
    assert(computes.get() == 3)
    // disabled (no path): always computes
    Sidecar.dataFrame(spark, Some("k"), None) {
      computes.incrementAndGet(); Seq(1L).toDF("x")
    }.collect()
    assert(computes.get() == 4)
  }

  test("jaccard pair sidecar: cached artifact is value-identical and " +
      "params are part of the key") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "text")
    val path = tmpDir() + "/d7_pairs"
    def collectPairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

    val plain = collectPairs(
      Dedup.jaccardExactPairs(docs, "text", "doc_id", "lang"))
    val first = collectPairs(Dedup.jaccardExactPairs(docs, "text",
      "doc_id", "lang", cacheKey = Some("u:1"), persistPath = Some(path)))
    val cached = collectPairs(Dedup.jaccardExactPairs(docs, "text",
      "doc_id", "lang", cacheKey = Some("u:1"), persistPath = Some(path)))
    assert(first == plain && cached == plain)

    // different THRESHOLD under the same caller key must not serve the
    // 4/5 artifact (params are folded into the sidecar key)
    val halfT = collectPairs(Dedup.jaccardExactPairs(docs, "text",
      "doc_id", "lang", thresholdNum = 1, thresholdDen = 2,
      cacheKey = Some("u:1"), persistPath = Some(path)))
    val halfPlain = collectPairs(Dedup.jaccardExactPairs(docs, "text",
      "doc_id", "lang", thresholdNum = 1, thresholdDen = 2))
    assert(halfT == halfPlain)
    // the artifact was re-keyed for the 1/2 run: the params really are
    // part of the key (the pair SETS can coincide on a tiny corpus, so
    // assert on the key itself)
    val storedKey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "_sidecar_key")), "UTF-8")
    assert(storedKey == "u:1:n3:t1/2", storedKey)
  }

  test("overwrite for a NEW key leaves the previous generation readable " +
      "(reader-during-overwrite safety)") {
    import spark.implicits._
    val path = tmpDir() + "/gen"
    // generation 1: resolve a lazy reader against it
    Sidecar.dataFrame(spark, Some("k1"), Some(path)) {
      Seq(1L, 2L).toDF("x")
    }.collect()
    val oldReader = Sidecar.dataFrame(spark, Some("k1"), Some(path)) {
      fail("k1 artifact must be served, not recomputed")
    }
    // generation 2 publishes while the old reader is still un-collected
    Sidecar.dataFrame(spark, Some("k2"), Some(path)) {
      Seq(10L, 20L, 30L).toDF("x")
    }.collect()
    // the previous generation's parquet is retained — the old reader
    // still completes (the overwrite never deleted the dir under it)
    assert(oldReader.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // and the pointer serves the new generation
    assert(Sidecar.dataFrame(spark, Some("k2"), Some(path)) {
      fail("k2 artifact must be served, not recomputed")
    }.count() == 3)
  }

  test("a torn publish (missing key pointer) recomputes; concurrent " +
      "producers of one key both succeed") {
    import spark.implicits._
    val path = tmpDir() + "/torn"
    val computes = new AtomicInteger(0)
    def produce(): Long = Sidecar.dataFrame(spark, Some("k"), Some(path)) {
      computes.incrementAndGet()
      Seq(1L, 2L, 3L).toDF("x")
    }.count()
    assert(produce() == 3 && computes.get() == 1)
    // tear the publish: pointer gone, parquet present -> must recompute
    java.nio.file.Files.delete(java.nio.file.Paths.get(path, "_sidecar_key"))
    assert(produce() == 3 && computes.get() == 2)

    // two concurrent producers of the SAME key: the rename loser discards
    // its (identical) temp content; both serve the artifact
    val path2 = tmpDir() + "/race"
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val threads = (0 until 2).map { _ =>
      new Thread(() => {
        val n = Sidecar.dataFrame(spark, Some("k"), Some(path2)) {
          Thread.sleep(100)
          Seq(5L, 6L).toDF("x")
        }.count()
        results.add(n); ()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(results.asScalaSeq == Seq(2L, 2L), results)
    // and the published artifact is intact for a later reader
    assert(Sidecar.dataFrame(spark, Some("k"), Some(path2)) {
      fail("artifact must be served after the race")
    }.count() == 2)
  }

  private implicit class QueueOps(q: java.util.concurrent.ConcurrentLinkedQueue[Long]) {
    def asScalaSeq: Seq[Long] = {
      import scala.jdk.CollectionConverters._
      q.asScala.toSeq.sorted
    }
  }

  test("d8/d11 consume the d7 sidecar; d13 consumes the d12 sidecar — " +
      "results equal the sidecar-free run") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "text", "n_chars")
    val base = tmpDir()
    val key = Some("docs:42")
    val pairPath = Some(s"$base/d7_pairs")
    val spanPath = Some(s"$base/d12_spans")

    // produce the artifacts (d7 / d12 roles)
    Dedup.jaccardExactPairs(docs, "text", "doc_id", "lang",
      cacheKey = key, persistPath = pairPath).count()
    Dedup.substringSpans(docs, "text", "doc_id", 8, 2,
      cacheKey = key, persistPath = spanPath).count()

    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    // consumers through the sidecar == consumers without it
    assert(rows(Dedup.jaccardClusters(docs, "text", "doc_id", "lang",
        cacheKey = key, persistPath = pairPath)) ==
      rows(Dedup.jaccardClusters(docs, "text", "doc_id", "lang")))
    assert(rows(Dedup.clusterSurvivorsByRank(docs, "text", "doc_id", "lang",
        "n_chars", cacheKey = key, persistPath = pairPath)) ==
      rows(Dedup.clusterSurvivorsByRank(docs, "text", "doc_id", "lang",
        "n_chars")))
    assert(rows(Dedup.substringClean(docs, "text", "doc_id", 8, 2,
        cacheKey = key, persistPath = spanPath)) ==
      rows(Dedup.substringClean(docs, "text", "doc_id", 8, 2)))
  }
}
