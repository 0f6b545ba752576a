package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ice._
import graft.ice.catalog._
import graft.ice.meta.TableMetadata
import graft.ice.types.SparkConv

/** `commit.status-check.*` reconciliation (reference
  * table_properties.h:86-93): an unknown-outcome commit attempt (the
  * write may or may not have landed) is reconciled by polling —
  * landed-but-ack-lost adopts the attempt WITHOUT a duplicate snapshot;
  * provably-not-landed re-enters the ordinary retry loop; genuinely
  * undecidable surfaces CommitStateUnknownException (never a blind
  * retry). */
class CommitStatusSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def warehouse() =
    java.nio.file.Files.createTempDirectory("whcsc").toString

  /** Commits succeed on disk, but the ACK of the next attempt is lost
    * AFTER the bytes landed — the timed-out-but-committed shape. */
  private final class AckLostCatalog(wh: String) extends DirCatalog(wh) {
    @volatile var loseNextAck = false
    override def commit(ident: TableIdentifier, baseVersion: Int,
        updated: TableMetadata): Int = {
      val v = super.commit(ident, baseVersion, updated)
      if (loseNextAck) {
        loseNextAck = false
        throw new CommitStateUnknownException(
          s"$ident: simulated lost ack for v$v", v)
      }
      v
    }
  }

  /** The next attempt fails BEFORE anything lands, but surfaces as
    * unknown (e.g. an IOException racing the write). */
  private final class NeverLandedCatalog(wh: String) extends DirCatalog(wh) {
    @volatile var failNext = false
    override def commit(ident: TableIdentifier, baseVersion: Int,
        updated: TableMetadata): Int = {
      if (failNext) {
        failNext = false
        throw new CommitStateUnknownException(
          s"$ident: simulated unknown failure before landing", baseVersion + 1)
      }
      super.commit(ident, baseVersion, updated)
    }
  }

  test("timed-out-but-committed attempt reconciles to success, no duplicate snapshot") {
    val cat = new AckLostCatalog(warehouse())
    val df = spark.range(0, 100).selectExpr("id", "id * 2 as v")
    val t = IceTable.create(cat, TableIdentifier.parse("db.ack"),
      SparkConv.fromSpark(df.schema),
      properties = Map("commit.status-check.min-wait-ms" -> "10"))
    t.append(spark).appendDataFrame(df)
    val snapsBefore = t.snapshots.size

    cat.loseNextAck = true
    t.append(spark).appendDataFrame(df) // must reconcile, not throw
    assert(t.snapshots.size == snapsBefore + 1,
      s"lost-ack commit must land exactly once, snaps=${t.snapshots.size}")
    assert(t.newScan().toDF(spark).count() == 200L)

    // the adopted metadata matches what a fresh load sees
    val fresh = IceTable.load(cat, TableIdentifier.parse("db.ack"))
    assert(fresh.currentSnapshot.map(_.snapshotId) ==
      t.currentSnapshot.map(_.snapshotId))
  }

  test("provably-not-landed unknown attempt re-enters the retry loop and succeeds") {
    val cat = new NeverLandedCatalog(warehouse())
    val df = spark.range(0, 50).selectExpr("id", "id * 3 as v")
    val t = IceTable.create(cat, TableIdentifier.parse("db.nl"),
      SparkConv.fromSpark(df.schema),
      properties = Map("commit.status-check.min-wait-ms" -> "10"))
    t.append(spark).appendDataFrame(df)
    cat.failNext = true
    t.append(spark).appendDataFrame(df)
    assert(t.snapshots.size == 2)
    assert(t.newScan().toDF(spark).count() == 100L)
  }

  test("genuinely undecidable outcome surfaces unknown, never blind-retries") {
    val wh = warehouse()
    val cat = new DirCatalog(wh) {
      @volatile var breakNext = false
      override def commit(ident: TableIdentifier, baseVersion: Int,
          updated: TableMetadata): Int = {
        if (breakNext) {
          breakNext = false
          throw new CommitStateUnknownException(
            s"$ident: simulated undecidable", baseVersion + 1)
        }
        super.commit(ident, baseVersion, updated)
      }
      override def commitLanded(ident: TableIdentifier, v: Int,
          attempted: TableMetadata, base: TableMetadata): Option[Boolean] = None
    }
    val df = spark.range(0, 10).selectExpr("id")
    val t = IceTable.create(cat, TableIdentifier.parse("db.ud"),
      SparkConv.fromSpark(df.schema),
      properties = Map(
        "commit.status-check.num-retries" -> "2",
        "commit.status-check.min-wait-ms" -> "5",
        "commit.status-check.max-wait-ms" -> "10"))
    t.append(spark).appendDataFrame(df)
    cat.breakNext = true
    val e = intercept[CommitStateUnknownException] {
      t.append(spark).appendDataFrame(df)
    }
    assert(e.getMessage.contains("undecidable"))
    assert(t.snapshots.size == 1, "an undecidable attempt must not blind-retry")
  }
}
