package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ice._
import graft.ice.catalog._
import graft.ice.expr.{Expr => E}
import graft.ice.transform.{ZOrderUtil, ZValueExpr}
import graft.ice.types._

/** Z-order rewrite: the curve key is order-correct and codegen matches
  * the interpreter, and the rewritten layout prunes files on EVERY
  * curve dimension where a linear sort only prunes the leading key. */
class ZOrderSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("encode primitives are order-preserving into unsigned space") {
    val longs = Seq(Long.MinValue, -5L, -1L, 0L, 1L, 42L, Long.MaxValue)
    val encL = longs.map(ZOrderUtil.encodeLong)
    assert(encL.zip(encL.tail).forall { case (a, b) =>
      java.lang.Long.compareUnsigned(a, b) < 0
    }, "encodeLong must preserve order unsigned")
    val doubles = Seq(Double.NegativeInfinity, -1e300, -2.5, -0.0, 0.0,
      1e-300, 3.14, Double.PositiveInfinity)
    val encD = doubles.map(ZOrderUtil.encodeDouble)
    assert(encD.zip(encD.tail).forall { case (a, b) =>
      java.lang.Long.compareUnsigned(a, b) <= 0
    }, "encodeDouble must preserve order unsigned")
    val strs = Seq("", "a", "ab", "b", "ba")
    val encS = strs.map(s => ZOrderUtil.encodeBytes(s.getBytes("UTF-8")))
    assert(encS.zip(encS.tail).forall { case (a, b) =>
      java.lang.Long.compareUnsigned(a, b) < 0
    }, "encodeBytes must preserve lexicographic order")
  }

  test("interleave: known bit patterns") {
    // two columns, all-ones and all-zeros -> alternating 10 bits = 0xAA
    val z = ZOrderUtil.interleave(Array(-1L, 0L))
    assert(z.length == 16 && z.forall(_ == 0xAA.toByte))
    // one column is the identity layout (big-endian of the code)
    val one = ZOrderUtil.interleave(Array(0x0123456789ABCDEFL))
    val bb = java.nio.ByteBuffer.allocate(8).putLong(0x0123456789ABCDEFL).array()
    assert(one.toSeq == bb.toSeq)
  }

  test("ZValueExpr codegen agrees with direct encode+interleave") {
    val df = spark.range(0, 1000).selectExpr(
      "cast(id % 97 as int) as a",
      "cast(id as long) as b",
      "cast(id as double) / 7.0 as d",
      "concat('s', id % 13) as s")
    val got = df.select(col("a"), col("b"), col("d"), col("s"),
      ZValueExpr.zvalue(Seq(col("a"), col("b"), col("d"), col("s"))).as("z"))
      .collect()
    got.foreach { r =>
      val want = ZOrderUtil.interleave(Array(
        ZOrderUtil.encodeLong(r.getInt(0).toLong),
        ZOrderUtil.encodeLong(r.getLong(1)),
        ZOrderUtil.encodeDouble(r.getDouble(2)),
        ZOrderUtil.encodeBytes(r.getString(3).getBytes("UTF-8"))))
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]]("z"), want))
    }
  }

  test("z-order rewrite prunes both dimensions; linear sort only the leading one") {
    val cat = new DirCatalog(java.nio.file.Files.createTempDirectory("whz").toString)
    // 256x256 uniform grid, written linearly sorted by `a` across 16 files
    val grid = spark.range(0, 65536).selectExpr(
      "cast(id % 256 as int) as a", "cast(id div 256 as int) as b",
      "id as payload")
    val sortedByA = grid.repartitionByRange(16, col("a")).sortWithinPartitions("a")
    val schema = SparkConv.fromSpark(sortedByA.schema)
    val t = IceTable.create(cat, TableIdentifier.parse("db.zgrid"), schema)
    t.append(spark).appendDataFrame(sortedByA)

    val total = t.newScan().planFiles().size
    assert(total >= 8, s"fixture should write many files, got $total")
    val bBox = E.gtEq("b", Literal.int(0)).and(E.lt("b", Literal.int(32)))
    val aBox = E.gtEq("a", Literal.int(0)).and(E.lt("a", Literal.int(32)))

    // linear-by-a layout: every file spans all of b -> b-predicates scan everything
    assert(t.newScan().filter(bBox).planFiles().size == total)
    assert(t.newScan().filter(aBox).planFiles().size <= total / 2)

    val bytes = t.newScan().planFiles().map(_.file.fileSizeInBytes).sum
    t.compact(spark).zorder(Seq("a", "b"), targetFileSizeBytes = math.max(1L, bytes / 16))
    val totalZ = t.newScan().planFiles().size
    assert(totalZ >= 8, s"z-order rewrite should keep ~16 files, got $totalZ")

    // curve tiles bound BOTH dimensions: a 1/8-of-range box on either
    // axis now skips most files
    val bPruned = t.newScan().filter(bBox).planFiles().size
    val aPruned = t.newScan().filter(aBox).planFiles().size
    assert(bPruned <= totalZ / 2, s"b-box scanned $bPruned of $totalZ")
    assert(aPruned <= totalZ / 2, s"a-box scanned $aPruned of $totalZ")

    // and results are exact
    assert(t.newScan().toDF(spark).count() == 65536L)
    assert(t.newScan().filter(bBox).toDF(spark)
      .filter("b >= 0 and b < 32").count() == 32L * 256)
    val both = E.lt("a", Literal.int(32)).and(E.lt("b", Literal.int(32)))
    assert(t.newScan().filter(both).toDF(spark)
      .filter("a < 32 and b < 32").count() == 32L * 32)
  }

  test("partitioned z-order: curve splits each directory into pruned file runs") {
    val cat = new DirCatalog(java.nio.file.Files.createTempDirectory("whzp").toString)
    // 4 identity partitions, each holding a 128x128 (a,b) grid
    val grid = spark.range(0, 65536).selectExpr(
      "cast(id % 4 as int) as p",
      "cast((id div 4) % 128 as int) as a",
      "cast((id div 4) div 128 as int) as b",
      "id as payload")
    val schema = SparkConv.fromSpark(grid.schema)
    val pid = schema.findFieldByName("p").get.id
    val t = IceTable.create(cat, TableIdentifier.parse("db.zpart"), schema,
      graft.ice.meta.PartitionSpec(0, IndexedSeq(
        graft.ice.meta.PartitionField(pid, 1000, "p",
          graft.ice.transform.IdentityTransform))))
    t.append(spark).appendDataFrame(grid)

    val before = t.newScan().planFiles().size
    val aBox = E.lt("a", Literal.int(16)) // 1/8 of the a range
    // default partitioned write: one file per directory spanning all of a
    assert(t.newScan().filter(aBox).planFiles().size == before)

    val bytes = t.newScan().planFiles().map(_.file.fileSizeInBytes).sum
    t.compact(spark).zorder(Seq("a", "b"), targetFileSizeBytes = math.max(1L, bytes / 16))
    val totalZ = t.newScan().planFiles().size
    assert(totalZ >= 8, s"curve should split dirs into multiple files, got $totalZ")

    val aPruned = t.newScan().filter(aBox).planFiles().size
    assert(aPruned <= totalZ / 2, s"a-box scanned $aPruned of $totalZ")
    // partition pruning composes with curve pruning
    val both = E.equal("p", Literal.int(1)).and(aBox)
    val composed = t.newScan().filter(both).planFiles().size
    assert(composed <= totalZ / 4, s"p+a scanned $composed of $totalZ")

    assert(t.newScan().toDF(spark).count() == 65536L)
    assert(t.newScan().filter(both).toDF(spark)
      .filter("p = 1 and a < 16").count() == 16L * 128)
  }

  test("z-order rewrite folds merge-on-read deletes in") {
    val cat = new DirCatalog(java.nio.file.Files.createTempDirectory("whzd").toString)
    val df = spark.range(0, 10000).selectExpr(
      "cast(id % 100 as int) as a", "cast(id div 100 as int) as b", "id as v")
    val t = IceTable.create(cat, TableIdentifier.parse("db.zdel"), SparkConv.fromSpark(df.schema))
    t.append(spark).appendDataFrame(df.repartition(8))
    t.delete(spark).deleteWherePositional(E.lt("a", Literal.int(10)))
    assert(t.newScan().toDF(spark).count() == 9000L)
    t.compact(spark).zorder(Seq("a", "b"))
    assert(t.newScan().toDF(spark).count() == 9000L)
    // delete files folded in: none survive the rewrite
    val snap = t.currentSnapshot.get
    assert(t.planDeleteEntries(snap).isEmpty)
    assert(snap.summary.get("zorder-cols").contains("a,b"))
  }
}
