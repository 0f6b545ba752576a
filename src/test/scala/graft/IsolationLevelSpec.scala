package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ice._
import graft.ice.catalog._
import graft.ice.expr.{Expr => E}
import graft.ice.meta.RequirementFailedException
import graft.ice.types.{Literal, SparkConv}

/** `write.{delete,update,merge}.isolation-level` (reference
  * table_properties.h:259+, declared default `serializable`): a
  * row-level operation that lost the commit race to a concurrent data
  * commit its predicate MIGHT match must abort — the serializable
  * history would have affected those rows. `snapshot` opts into the
  * weaker read-your-snapshot semantics; non-matching concurrent commits
  * (provably excluded by partition/metrics bounds) never conflict. */
class IsolationLevelSpec extends AnyFunSuite with BeforeAndAfterAll {

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
    java.nio.file.Files.createTempDirectory("whiso").toString
  private def cat = new DirCatalog(warehouse)

  private def freshTable(name: String, props: Map[String, String] = Map.empty): IceTable = {
    val df = spark.range(0, 100).selectExpr("id", "id * 2 as v")
    val t = IceTable.create(cat, TableIdentifier.parse(s"db.$name"),
      SparkConv.fromSpark(df.schema), properties = props)
    t.append(spark).appendDataFrame(df)
    t
  }

  test("serializable DELETE aborts on a concurrent commit its predicate may match") {
    val t1 = freshTable("iso_del")
    // a second handle commits MATCHING rows while t1 still holds the old
    // version — t1's delete loses the race, retries on the fresh base,
    // and must see the conflict instead of silently missing those rows
    val t2 = IceTable.load(cat, TableIdentifier.parse("db.iso_del"))
    t2.append(spark).appendDataFrame(
      spark.range(0, 10).selectExpr("id", "id * 2 as v"))
    val e = intercept[RequirementFailedException] {
      t1.delete(spark).deleteWhere(E.lt("id", Literal.long(50)))
    }
    assert(e.getMessage.contains("serializable isolation violated"))
    // nothing was deleted
    assert(t2.newScan().toDF(spark).count() == 110L)
  }

  test("non-matching concurrent commit does NOT conflict (bounds exclude it)") {
    val t1 = freshTable("iso_ok")
    val t2 = IceTable.load(cat, TableIdentifier.parse("db.iso_ok"))
    // concurrent rows all have id >= 1000 — provably outside id < 50
    t2.append(spark).appendDataFrame(
      spark.range(1000, 1010).selectExpr("id", "id * 2 as v"))
    t1.delete(spark).deleteWhere(E.lt("id", Literal.long(50)))
    val fresh = IceTable.load(cat, TableIdentifier.parse("db.iso_ok"))
    assert(fresh.newScan().toDF(spark).count() == 60L)
  }

  test("snapshot isolation lets the concurrent rows survive the delete") {
    val t1 = freshTable("iso_snap",
      Map("write.delete.isolation-level" -> "snapshot"))
    val t2 = IceTable.load(cat, TableIdentifier.parse("db.iso_snap"))
    t2.append(spark).appendDataFrame(
      spark.range(0, 10).selectExpr("id", "id * 2 as v"))
    t1.delete(spark).deleteWhere(E.lt("id", Literal.long(50)))
    // planned rows deleted; the 10 concurrent (matching) rows survive
    val fresh = IceTable.load(cat, TableIdentifier.parse("db.iso_snap"))
    assert(fresh.newScan().toDF(spark).count() == 60L)
  }

  test("serializable MoR delete and MERGE conflict whole-table-conservatively") {
    val t1 = freshTable("iso_mor",
      Map("write.delete.mode" -> "merge-on-read"))
    val t2 = IceTable.load(cat, TableIdentifier.parse("db.iso_mor"))
    t2.append(spark).appendDataFrame(
      spark.range(0, 5).selectExpr("id", "id * 2 as v"))
    intercept[RequirementFailedException] {
      t1.delete(spark).deleteWherePositional(E.lt("id", Literal.long(50)))
    }

    val m1 = freshTable("iso_mrg")
    val m2 = IceTable.load(cat, TableIdentifier.parse("db.iso_mrg"))
    m2.append(spark).appendDataFrame(
      spark.range(200, 205).selectExpr("id", "id * 2 as v"))
    val src = spark.range(0, 5).selectExpr("id", "id * 100 as v")
    intercept[RequirementFailedException] {
      m1.merge(spark, src, Seq("id")).whenMatchedUpdateAll().commit()
    }
    // snapshot mode opts out
    m2.commit(b => b.copy(properties =
      b.properties + ("write.merge.isolation-level" -> "snapshot")))
    val m3 = IceTable.load(cat, TableIdentifier.parse("db.iso_mrg"))
    m3.merge(spark, src, Seq("id")).whenMatchedUpdateAll().commit()
    val freshM = IceTable.load(cat, TableIdentifier.parse("db.iso_mrg"))
    assert(freshM.newScan().toDF(spark).filter("id = 1 AND v = 100").count() == 1L)
  }

  test("serializable UPDATE aborts on a concurrent MoR DELETE (no row resurrection)") {
    // v2 MoR position delete racing an UPDATE: the update planned against
    // the old base and would re-append rows the concurrent delete removed
    // (new paths, higher data sequence — escaping the delete). The
    // serializable check must also scan Deletes manifests, not just Data.
    val t1 = freshTable("iso_updel",
      Map("write.delete.mode" -> "merge-on-read", "format-version" -> "2"))
    val t2 = IceTable.load(cat, TableIdentifier.parse("db.iso_updel"))
    t2.delete(spark).deleteWherePositional(E.lt("id", Literal.long(10)))
    val e = intercept[RequirementFailedException] {
      t1.delete(spark).updateWhere(E.lt("id", Literal.long(50)),
        Map("v" -> "v + 1"))
    }
    assert(e.getMessage.contains("delete file"),
      s"the conflict must be attributed to the concurrent delete plane: ${e.getMessage}")
    // neither resurrected nor updated: the 10 deleted rows stay gone
    val fresh = IceTable.load(cat, TableIdentifier.parse("db.iso_updel"))
    assert(fresh.newScan().toDF(spark).count() == 90L)
    assert(fresh.newScan().toDF(spark).filter("id < 10").count() == 0L)
  }

  test("concurrent POSITION delete on provably-disjoint files does not conflict") {
    // position deletes carry no column bounds, but they do carry file
    // scope (file_path bounds / referenced-data-file). A concurrent
    // position delete whose scoped files are disjoint from every data
    // file the operation's predicate can touch must NOT abort — the
    // availability half of serializable isolation.
    val t1 = freshTable("iso_posok",
      Map("write.delete.mode" -> "merge-on-read", "format-version" -> "2"))
    val t2 = IceTable.load(cat, TableIdentifier.parse("db.iso_posok"))
    // delete ids < 10: scoped by path bounds to the low-id file(s)
    t2.delete(spark).deleteWherePositional(E.lt("id", Literal.long(10)))
    // update ids >= 90: metrics confine the scan to the high-id file(s)
    t1.delete(spark).updateWhere(E.gtEq("id", Literal.long(90)),
      Map("v" -> "v + 1"))
    val fresh = IceTable.load(cat, TableIdentifier.parse("db.iso_posok"))
    assert(fresh.newScan().toDF(spark).count() == 90L)
    assert(fresh.newScan().toDF(spark).filter("id < 10").count() == 0L)
    assert(fresh.newScan().toDF(spark).filter("id = 95 AND v = 191").count() == 1L)
  }

  test("concurrent equality delete with provably-disjoint key bounds does not conflict") {
    val t1 = freshTable("iso_eqok",
      Map("write.delete.mode" -> "merge-on-read", "format-version" -> "2"))
    val t2 = IceTable.load(cat, TableIdentifier.parse("db.iso_eqok"))
    // equality delete on ids 90..99 — key bounds provably outside id < 50
    t2.delete(spark).deleteByEquality(
      spark.range(90, 100).selectExpr("id"))
    t1.delete(spark).updateWhere(E.lt("id", Literal.long(50)),
      Map("v" -> "v + 1"))
    val fresh = IceTable.load(cat, TableIdentifier.parse("db.iso_eqok"))
    assert(fresh.newScan().toDF(spark).count() == 90L)
    assert(fresh.newScan().toDF(spark).filter("id = 1 AND v = 3").count() == 1L)
  }
}
