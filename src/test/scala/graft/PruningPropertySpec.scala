package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ice._
import graft.ice.catalog._
import graft.ice.expr.{Expr => E, _}
import graft.ice.meta._
import graft.ice.transform._
import graft.ice.types._

/** FIXTURES.md §5 pruning-safety property: for random predicates, a
  * pruned scan returns exactly the rows the raw data filter returns —
  * pruning may only skip files that cannot contain matches, never rows.
  * Deterministic pseudo-random predicate generation (seed fixed). */
class PruningPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("pruned scans lose no rows over 40 random predicates (bucket+month table)") {
    val cat = new DirCatalog(java.nio.file.Files.createTempDirectory("whp").toString)
    val raw = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val schema = SparkConv.fromSpark(raw.schema)
    val ok = schema.findFieldByName("l_orderkey").get.id
    val sd = schema.findFieldByName("l_shipdate").get.id
    val spec = PartitionSpec(0, IndexedSeq(
      PartitionField(ok, 1000, "okb", BucketTransform(4)),
      PartitionField(sd, 1001, "sm", MonthTransform)))
    val t = IceTable.create(cat, TableIdentifier.parse("db.prop"), schema, spec)
    // two appends so bounds/files vary
    t.append(spark).appendDataFrame(raw.filter("l_orderkey % 2 = 0"))
    t.append(spark).appendDataFrame(raw.filter("l_orderkey % 2 = 1"))

    val rnd = new scala.util.Random(42)
    val totalFiles = t.newScan().planFiles().size
    var prunedAtLeastOnce = false

    def randomPredicate(): (E.type => Unit, graft.ice.expr.Expr, String) = {
      val keys = Seq(1L, 500L, 2000L, 4000L, 6000L)
      val dates = Seq("1997-01-01", "1999-06-15", "2001-01-01", "2003-12-31")
      rnd.nextInt(6) match {
        case 0 =>
          val k = keys(rnd.nextInt(keys.size))
          (null, E.equal("l_orderkey", Literal.long(k)), s"l_orderkey = $k")
        case 1 =>
          val k = keys(rnd.nextInt(keys.size))
          (null, E.lt("l_orderkey", Literal.long(k)), s"l_orderkey < $k")
        case 2 =>
          val d = dates(rnd.nextInt(dates.size))
          (null, E.gtEq("l_shipdate", Literal.string(d)),
            s"l_shipdate >= timestamp_ntz'$d 00:00:00'")
        case 3 =>
          val d = dates(rnd.nextInt(dates.size))
          (null, E.lt("l_shipdate", Literal.string(d)),
            s"l_shipdate < timestamp_ntz'$d 00:00:00'")
        case 4 =>
          val f = Seq("A", "N", "R")(rnd.nextInt(3))
          (null, E.equal("l_returnflag", Literal.string(f)), s"l_returnflag = '$f'")
        case 5 =>
          val k = keys(rnd.nextInt(keys.size))
          val d = dates(rnd.nextInt(dates.size))
          (null, E.lt("l_orderkey", Literal.long(k))
            .and(E.gtEq("l_shipdate", Literal.string(d))),
            s"l_orderkey < $k AND l_shipdate >= timestamp_ntz'$d 00:00:00'")
      }
    }

    for (_ <- 1 to 40) {
      val (_, expr, sql) = randomPredicate()
      val scan = t.newScan().filter(expr)
      val planned = scan.planFiles().size
      if (planned < totalFiles) prunedAtLeastOnce = true
      val got = scan.toDF(spark).count()
      val expected = raw.filter(sql).count()
      assert(got == expected, s"predicate [$sql]: pruned scan $got != raw $expected " +
        s"(planned $planned/$totalFiles files)")
    }
    assert(prunedAtLeastOnce, "no predicate ever pruned — evaluators inert?")
  }

  test("pruned scans lose no rows across an evolved partition spec") {
    // same property over a table whose files span TWO specs (year -> month
    // -> plus a sorted-write unpartitioned tail): per-manifest spec
    // resolution must stay sound for every predicate
    val cat = new DirCatalog(java.nio.file.Files.createTempDirectory("whp2").toString)
    val raw = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val schema = SparkConv.fromSpark(raw.schema)
    val od = schema.findFieldByName("o_orderdate").get.id
    val t = IceTable.create(cat, TableIdentifier.parse("db.prop2"), schema,
      PartitionSpec(0, IndexedSeq(PartitionField(od, 1000, "oy", YearTransform))))
    t.append(spark).appendDataFrame(raw.filter("o_orderkey % 3 = 0"))
    t.updateSpec().addField("om", "o_orderdate", MonthTransform).commit()
    t.append(spark).appendDataFrame(raw.filter("o_orderkey % 3 = 1"))
    t.updateSpec().commit() // unpartitioned tail
    t.append(spark).appendDataFrame(raw.filter("o_orderkey % 3 = 2"))

    val rnd = new scala.util.Random(11)
    val totalFiles = t.newScan().planFiles().size
    var prunedAtLeastOnce = false
    val dates = Seq("1997-06-01", "1999-01-01", "2001-07-04", "2003-01-01")
    for (_ <- 1 to 30) {
      val d = dates(rnd.nextInt(dates.size))
      val k = 1 + rnd.nextInt(1500)
      val (expr, sql) = rnd.nextInt(3) match {
        case 0 => (E.gtEq("o_orderdate", Literal.string(d)),
          s"o_orderdate >= timestamp_ntz'$d 00:00:00'")
        case 1 => (E.lt("o_orderdate", Literal.string(d)),
          s"o_orderdate < timestamp_ntz'$d 00:00:00'")
        case 2 => (E.lt("o_orderkey", Literal.long(k))
          .and(E.gtEq("o_orderdate", Literal.string(d))),
          s"o_orderkey < $k AND o_orderdate >= timestamp_ntz'$d 00:00:00'")
      }
      val scan = t.newScan().filter(expr)
      if (scan.planFiles().size < totalFiles) prunedAtLeastOnce = true
      assert(scan.toDF(spark).count() == raw.filter(sql).count(),
        s"predicate [$sql] lost rows across evolved specs")
    }
    assert(prunedAtLeastOnce)
  }

  test("join-key runtime pruning skips files and loses no join rows") {
    import org.apache.spark.sql.functions._
    val cat = new DirCatalog(java.nio.file.Files.createTempDirectory("whj").toString)
    val raw = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val schema = SparkConv.fromSpark(raw.schema)
    val t = IceTable.create(cat, TableIdentifier.parse("db.dppfact"), schema)
    // key-clustered appends: four files with disjoint o_orderkey ranges,
    // the layout where runtime file skipping pays
    val maxKey = raw.agg(max("o_orderkey")).head.getLong(0)
    val step = maxKey / 4 + 1
    for (i <- 0L until 4L)
      t.append(spark).appendDataFrame(
        raw.where(col("o_orderkey") >= i * step && col("o_orderkey") < (i + 1) * step))
    val totalFiles = t.newScan().planFiles().size
    assert(totalFiles == 4)

    // dim keys all land in the first key quarter -> one surviving file
    val dim = raw.where(col("o_orderkey") < step / 2).limit(50)
      .select(col("o_orderkey").as("key"))
    val pruned = t.newScan().pruneByJoinKeys(dim, "o_orderkey")
    assert(pruned.planFiles().size == 1,
      s"expected 1 of $totalFiles files after join-key pruning")

    // the pruned scan joined to the dim equals the raw join
    val got = pruned.toDF(spark)
      .join(dim, col("o_orderkey") === col("key"))
      .agg(count("*"), sum("o_totalprice")).head
    val want = raw.join(dim, col("o_orderkey") === col("key"))
      .agg(count("*"), sum("o_totalprice")).head
    assert(got.getLong(0) == want.getLong(0))
    assert(math.abs(got.getDouble(1) - want.getDouble(1)) < 1e-6)

    // over-cap degrades to a min/max range: still skips the quarters the
    // dim never touches, still loses no join rows
    val ranged = t.newScan().pruneByJoinKeys(dim, "o_orderkey", maxKeys = 5)
    assert(ranged.planFiles().size == 1)
    val got2 = ranged.toDF(spark)
      .join(dim, col("o_orderkey") === col("key"))
      .agg(count("*")).head.getLong(0)
    assert(got2 == want.getLong(0))

    // keys spanning all quarters prune nothing — and drop nothing
    val wide = raw.select(col("o_orderkey").as("key")).limit(20000)
    val all = t.newScan().pruneByJoinKeys(wide, "o_orderkey", maxKeys = 100)
    assert(all.planFiles().size == totalFiles)
  }

  test("literal serde round-trips for random values (property)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val lit = rnd.nextInt(6) match {
        case 0 => Literal.int(rnd.nextInt())
        case 1 => Literal.long(rnd.nextLong())
        case 2 => Literal.double(rnd.nextDouble() * 1e6 - 5e5)
        case 3 => Literal.string(rnd.alphanumeric.take(rnd.nextInt(20)).mkString)
        case 4 => Literal.date(rnd.nextInt(40000) - 10000)
        case 5 => Literal.decimal(
          new java.math.BigDecimal(java.math.BigInteger.valueOf(rnd.nextLong() % 1000000000L), 2), 18)
      }
      val back = Literal.deserialize(lit.tpe, lit.serialize)
      assert(back.compareTo(lit).contains(0), s"round trip failed for ${lit.tpe}: ${lit.raw}")
    }
  }
}
