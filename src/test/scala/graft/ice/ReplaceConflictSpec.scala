package graft.ice.write

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ice._
import graft.ice.catalog._
import graft.ice.expr.{Expr => E}
import graft.ice.meta._
import graft.ice.types._

/** Replace-groups (row-level CoW) commit validation: a rewrite computed
  * from scan-time file content must abort — not silently absorb — when
  * the current base no longer matches that state (ADVICE r9 medium:
  * the commit previously applied scan-time replacedFiles to a freshly
  * loaded base with no conflict check, duplicating or resurrecting
  * rows under concurrency). */
class ReplaceConflictSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sfDir = "/root/testdata/sf0.001"

  private def fresh(name: String): IceTable = {
    val cat = new DirCatalog(java.nio.file.Files.createTempDirectory("wh").toString)
    val raw = spark.read.parquet(s"$sfDir/orders.parquet")
    val t = IceTable.create(cat, TableIdentifier.parse(s"db.$name"),
      SparkConv.fromSpark(raw.schema))
    t.append(spark).appendDataFrame(raw)
    t
  }

  private def plannedState(t: IceTable): ReplaceGroupsState =
    ReplaceGroupsState(
      t.newScan().planFiles().map(_.file.filePath).toSet,
      t.currentSnapshot.map(t.planDeleteEntries).getOrElse(Nil)
        .map(_.dataFile.filePath).toSet)

  test("commit aborts when a replaced file was concurrently rewritten") {
    val t = fresh("rc1")
    val st = plannedState(t)
    assert(st.replaced.nonEmpty)
    // concurrent CoW delete rewrites the files containing 'F' rows
    t.delete(spark).deleteWhere(E.equal("o_orderstatus", Literal.string("F")))
    val ex = intercept[RequirementFailedException] {
      SnapshotProducer.commit(t, spark, DataOperation.Overwrite, Nil,
        removedPaths = st.replaced, expectedReplaced = Some(st))
    }
    assert(ex.getMessage.contains("concurrent commit removed"))
  }

  test("commit aborts when a new delete file covers a replaced file") {
    val t = fresh("rc2")
    val st = plannedState(t)
    // concurrent MoR position delete lands AFTER planning
    t.delete(spark).deleteWherePositional(
      E.equal("o_orderstatus", Literal.string("F")))
    val ex = intercept[RequirementFailedException] {
      SnapshotProducer.commit(t, spark, DataOperation.Overwrite, Nil,
        removedPaths = st.replaced, expectedReplaced = Some(st))
    }
    assert(ex.getMessage.contains("resurrect"))
  }

  test("commit proceeds when the planned state still holds") {
    val t = fresh("rc3")
    val st = plannedState(t)
    SnapshotProducer.commit(t, spark, DataOperation.Overwrite, Nil,
      removedPaths = st.replaced, expectedReplaced = Some(st))
    assert(t.newScan().planFiles().isEmpty)
  }

  test("position delete files carry file_path bounds bracketing their targets") {
    import graft.ice.manifest._
    val t = fresh("rc5")
    val dataPaths = t.newScan().planFiles()
      .map(f => ManifestAvro.stripFileScheme(f.file.filePath))
    t.delete(spark).deleteWherePositional(
      E.equal("o_orderstatus", Literal.string("F")))
    val dels = t.currentSnapshot.map(t.planDeleteEntries).getOrElse(Nil)
    assert(dels.nonEmpty)
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    dels.foreach { e =>
      val lo = new String(e.dataFile.lowerBounds(RowDelete.PathBoundFieldId), utf8)
      val hi = new String(e.dataFile.upperBounds(RowDelete.PathBoundFieldId), utf8)
      assert(lo <= hi)
      assert(dataPaths.exists(p => lo <= p && p <= hi),
        "bounds must bracket at least one data file the delete references")
    }
  }

  test("a concurrent delete file provably outside the replaced paths does not abort") {
    import graft.ice.manifest._
    val t = fresh("rc6")
    val st = plannedState(t)
    // a new delete file lands AFTER planning, but its file_path bounds
    // bracket a range lexicographically ABOVE every replaced path ('~'
    // sorts above '/'): it cannot cover a replaced file, so the
    // narrowed check must let the rewrite proceed instead of aborting
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val del = ManifestEntry(ManifestStatus.Added, None, None, None,
      DataFile(FileContent.PositionDeletes,
        s"${t.dataFileDir}/disjoint-deletes.parquet", "PARQUET",
        IndexedSeq.empty, recordCount = 1, fileSizeInBytes = 10,
        lowerBounds = Map(RowDelete.PathBoundFieldId -> "~a".getBytes(utf8)),
        upperBounds = Map(RowDelete.PathBoundFieldId -> "~z".getBytes(utf8))))
    SnapshotProducer.commit(t, spark, DataOperation.Delete, Nil,
      addedDeleteEntries = Seq(del))
    SnapshotProducer.commit(t, spark, DataOperation.Overwrite, Nil,
      removedPaths = st.replaced, expectedReplaced = Some(st))
    assert(t.newScan().planFiles().isEmpty)
  }

  test("REST-backed replace-groups: benign interleave retries to success, conflicting op aborts") {
    val backing = new DirCatalog(
      java.nio.file.Files.createTempDirectory("rest-wh").toString)
    val server = new graft.ice.catalog.RestCatalogServer(backing)
    try {
      val cat = new graft.ice.catalog.RestCatalog(server.baseUrl)
      cat.createNamespace(Seq("db"))
      val raw = spark.read.parquet(s"$sfDir/orders.parquet")
      val ident = TableIdentifier.parse("db.rowrace")
      IceTable.create(cat, ident, SparkConv.fromSpark(raw.schema))
        .append(spark).appendDataFrame(raw)

      // client B plans a row-level rewrite; client A interleaves a
      // BENIGN append (touches none of B's files). B's 409-retry loop
      // refreshes, re-validates the replace-groups state against the
      // new base, and lands.
      val b = IceTable.load(new graft.ice.catalog.RestCatalog(server.baseUrl), ident)
      val stB = plannedState(b)
      IceTable.load(cat, ident).append(spark).appendDataFrame(raw.limit(5))
      SnapshotProducer.commit(b, spark, DataOperation.Overwrite, Nil,
        removedPaths = stB.replaced, expectedReplaced = Some(stB))
      assert(IceTable.load(cat, ident).newScan().toDF(spark).count() == 5)

      // client C plans from the current state; client D concurrently
      // CoW-rewrites the same files. C's retry must ABORT on the
      // re-validation (its replaced files are gone), never absorb it.
      val c = IceTable.load(new graft.ice.catalog.RestCatalog(server.baseUrl), ident)
      val stC = plannedState(c)
      assert(stC.replaced.nonEmpty)
      IceTable.load(cat, ident).delete(spark)
        .deleteWhere(E.raw("o_orderkey >= 0"))
      val ex = intercept[RequirementFailedException] {
        SnapshotProducer.commit(c, spark, DataOperation.Overwrite, Nil,
          removedPaths = stC.replaced, expectedReplaced = Some(stC))
      }
      assert(ex.getMessage.contains("concurrent commit removed"))
    } finally server.stop()
  }

  test("pre-existing delete files the scan applied do not trip the check") {
    val t = fresh("rc4")
    // MoR delete BEFORE planning: its path lands in expectedDeletePaths
    t.delete(spark).deleteWherePositional(
      E.equal("o_orderstatus", Literal.string("P")))
    val st = plannedState(t)
    assert(st.expectedDeletePaths.nonEmpty)
    SnapshotProducer.commit(t, spark, DataOperation.Overwrite, Nil,
      removedPaths = st.replaced, expectedReplaced = Some(st))
    assert(t.newScan().planFiles().isEmpty)
  }
}
