package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ice._
import graft.ice.catalog._
import graft.ice.expr.{Expr => E}
import graft.ice.types.{Literal, SparkConv}

/** `read.data-planning-mode` / `read.delete-planning-mode` (reference
  * table_properties.h:204-206): local / distributed / auto must plan the
  * SAME file and delete sets — the mode only moves WHERE manifests are
  * read. Delete entries keep their stats under distributed planning
  * (bounds scope which data files a delete file can cover). */
class PlanningModeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("whpm").toString

  test("planning modes agree on files, delete entries, and scan results") {
    val cat = new DirCatalog(warehouse)
    val raw = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val t = IceTable.create(cat, TableIdentifier.parse("db.pm"),
      SparkConv.fromSpark(raw.schema),
      properties = Map("write.delete.mode" -> "merge-on-read"))
    t.append(spark).appendDataFrame(raw.repartition(4))
    t.delete(spark).deleteWherePositional(
      E.lt("o_orderkey", Literal.long(500)))

    def withMode(m: String): (Seq[String], Seq[String], Long) = {
      t.commit(b => b.copy(properties = b.properties ++ Map(
        "read.data-planning-mode" -> m,
        "read.delete-planning-mode" -> m)))
      val files = t.newScan().planFiles().map(_.file.filePath).sorted
      val dels = t.currentSnapshot.toSeq.flatMap(t.planDeleteEntries)
      // distributed delete planning must NOT strip the delete entries'
      // metric maps (their path bounds scope applicability)
      assert(dels.forall(_.dataFile.lowerBounds.nonEmpty),
        s"mode=$m lost delete-entry bounds")
      (files, dels.map(_.dataFile.filePath).sorted,
        t.newScan().toDF(spark).count())
    }

    val local = withMode("local")
    val dist = withMode("distributed")
    val auto = withMode("auto")
    assert(local == dist, "local vs distributed planning disagree")
    assert(local == auto, "local vs auto planning disagree")
    assert(local._3 == raw.filter("o_orderkey >= 500").count())

    // pruned planning agrees too (the distributed path prunes on executors)
    t.commit(b => b.copy(properties =
      b.properties + ("read.data-planning-mode" -> "distributed")))
    val prunedDist = t.newScan()
      .filter(E.lt("o_orderkey", Literal.long(100))).planFiles().size
    t.commit(b => b.copy(properties =
      b.properties + ("read.data-planning-mode" -> "local")))
    val prunedLocal = t.newScan()
      .filter(E.lt("o_orderkey", Literal.long(100))).planFiles().size
    assert(prunedDist == prunedLocal)
  }
}
