package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ice._
import graft.ice.catalog._
import graft.ice.expr.{Expr => E, _}
import graft.ice.manifest.DataFile
import graft.ice.meta._
import graft.ice.transform._
import graft.ice.types._

/** Strict metrics evaluation soundness: `allRowsMatch(e, f)` must imply
  * that EVERY row of f satisfies e (checked against the actual file
  * contents for random predicates), and must refuse (false) whenever the
  * metrics cannot prove it — nulls, NaN-capable floats without nan
  * counts, truncated bounds. The strict answer is a proof, so a single
  * counterexample row is a hard failure. */
class StrictEvaluatorSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val strict = new StrictMetricsEvaluator
  private val inclusive = new MetricsEvaluator

  test("strict => every row matches, over random predicates on real files") {
    val cat = new DirCatalog(java.nio.file.Files.createTempDirectory("whs").toString)
    val raw = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val schema = SparkConv.fromSpark(raw.schema)
    val ck = schema.findFieldByName("o_custkey").get.id
    val spec = PartitionSpec(0, IndexedSeq(
      PartitionField(ck, 1000, "ckb", BucketTransform(4))))
    val t = IceTable.create(cat, TableIdentifier.parse("db.strict"), schema, spec)
    t.append(spark).appendDataFrame(raw)

    val files = t.newScan().planFiles().map(_.file)
    assert(files.size > 1)

    val rnd = new scala.util.Random(7)
    val keys = Seq(1L, 100L, 1000L, 3000L, 10000L, 100000L)
    val stats = Seq("F", "O", "P")
    def randomExpr(): (graft.ice.expr.Expr, String) = rnd.nextInt(8) match {
      case 0 => val k = keys(rnd.nextInt(keys.size))
        (E.lt("o_orderkey", Literal.long(k)), s"o_orderkey < $k")
      case 1 => val k = keys(rnd.nextInt(keys.size))
        (E.gtEq("o_orderkey", Literal.long(k)), s"o_orderkey >= $k")
      case 2 => val s0 = stats(rnd.nextInt(stats.size))
        (E.equal("o_orderstatus", Literal.string(s0)), s"o_orderstatus = '$s0'")
      case 3 => val s0 = stats(rnd.nextInt(stats.size))
        (E.notEqual("o_orderstatus", Literal.string(s0)), s"o_orderstatus <> '$s0'")
      case 4 => (E.in("o_orderstatus", stats.map(Literal.string)),
        "o_orderstatus in ('F','O','P')")
      case 5 => (E.notNull("o_orderpriority"), "o_orderpriority is not null")
      case 6 => val k = keys(rnd.nextInt(keys.size))
        (E.and(E.gtEq("o_orderkey", Literal.long(1L)), E.lt("o_orderkey", Literal.long(k))),
          s"o_orderkey >= 1 and o_orderkey < $k")
      case 7 => (E.startsWith("o_orderpriority", "1"), "o_orderpriority like '1%'")
    }

    var strictFired = 0
    (1 to 60).foreach { _ =>
      val (e, sql) = randomExpr()
      val bound = Binder.bind(e, t.schema)
      files.foreach { f =>
        if (strict.allRowsMatch(bound, f)) {
          strictFired += 1
          val rows = spark.read.parquet(f.filePath)
          val total = rows.count()
          val matching = rows.filter(sql).count()
          assert(matching == total,
            s"strict claimed all ${total} rows of ${f.filePath} match [$sql] but only $matching do")
          assert(total == f.recordCount)
        }
      }
    }
    assert(strictFired > 10, s"strict evaluation never fired (fired=$strictFired)")
  }

  test("strict and inclusive are consistent: strict implies inclusive (nonempty files)") {
    val cat = new DirCatalog(java.nio.file.Files.createTempDirectory("whs2").toString)
    val raw = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    val t = IceTable.create(cat, TableIdentifier.parse("db.sin"),
      SparkConv.fromSpark(raw.schema), PartitionSpec.unpartitioned)
    t.append(spark).appendDataFrame(raw)
    val files = t.newScan().planFiles().map(_.file)
    val exprs = Seq(
      E.ltEq("n_nationkey", Literal.int(24)),
      E.gtEq("n_nationkey", Literal.int(0)),
      E.lt("n_nationkey", Literal.int(5)),
      E.notNull("n_name"))
    for (e <- exprs; f <- files if f.recordCount > 0) {
      val b = Binder.bind(e, t.schema)
      if (strict.allRowsMatch(b, f))
        assert(inclusive.canContainRows(b, f), s"strict true but inclusive false for $e")
    }
  }

  test("countFromMetadata proves counts; refuses deletes and partial matches") {
    val cat = new DirCatalog(java.nio.file.Files.createTempDirectory("whc").toString)
    val raw = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val schema = SparkConv.fromSpark(raw.schema)
    val spec = PartitionSpec(0, IndexedSeq(PartitionField(
      schema.findFieldByName("o_orderstatus").get.id, 1000,
      "status", IdentityTransform)))
    val t = IceTable.create(cat, TableIdentifier.parse("db.cnt"), schema, spec)
    t.append(spark).appendDataFrame(raw)

    assert(t.newScan().countFromMetadata().contains(raw.count()))
    assert(t.newScan()
      .filter(E.equal("o_orderstatus", Literal.string("F")))
      .countFromMetadata().contains(raw.filter("o_orderstatus = 'F'").count()))
    // straddling predicate: not provable -> None, never a guess
    assert(t.newScan()
      .filter(E.lt("o_orderkey", Literal.long(700L)))
      .countFromMetadata().isEmpty)
    // limit caps the proved count
    assert(t.newScan().limit(10).countFromMetadata().contains(10L))
    // deletes make record counts non-authoritative
    t.delete(spark).deleteWherePositional(E.lt("o_orderkey", Literal.long(50L)))
    assert(t.newScan().countFromMetadata().isEmpty)
  }

  // ---- metric edge cases on synthetic files ----

  private val syntheticSchema = Schema(0, IndexedSeq(
    NestedField(1, "k", LongT, required = true),
    NestedField(2, "s", StringT, required = false),
    NestedField(3, "x", DoubleT, required = false)))

  private def df(rows: Long,
      valueCounts: Map[Int, Long] = Map.empty,
      nullCounts: Map[Int, Long] = Map.empty,
      nanCounts: Map[Int, Long] = Map.empty,
      lower: Map[Int, Literal] = Map.empty,
      upper: Map[Int, Literal] = Map.empty): DataFile =
    DataFile(0, "mem://f.parquet", "PARQUET", IndexedSeq.empty, rows, 1024L,
      valueCounts = valueCounts, nullValueCounts = nullCounts,
      nanValueCounts = nanCounts,
      lowerBounds = lower.view.mapValues(_.serialize).toMap,
      upperBounds = upper.view.mapValues(_.serialize).toMap)

  private def bind(e: graft.ice.expr.Expr): Bound = Binder.bind(e, syntheticSchema)

  test("nullable column without zero null count is never strict for comparisons") {
    val f = df(10, valueCounts = Map(2 -> 10L),
      lower = Map(2 -> Literal.string("a")), upper = Map(2 -> Literal.string("b")))
    // no null count recorded -> a null row may hide -> refuse
    assert(!strict.allRowsMatch(bind(E.gtEq("s", Literal.string("a"))), f))
    assert(!strict.allRowsMatch(bind(E.notNull("s")), f))
    val g = df(10, valueCounts = Map(2 -> 10L), nullCounts = Map(2 -> 0L),
      lower = Map(2 -> Literal.string("a")), upper = Map(2 -> Literal.string("b")))
    assert(strict.allRowsMatch(bind(E.gtEq("s", Literal.string("a"))), g))
    assert(strict.allRowsMatch(bind(E.notNull("s")), g))
  }

  test("required column is strict without explicit null counts") {
    val f = df(10, lower = Map(1 -> Literal.long(5L)), upper = Map(1 -> Literal.long(9L)))
    assert(strict.allRowsMatch(bind(E.gtEq("k", Literal.long(5L))), f))
    assert(strict.allRowsMatch(bind(E.ltEq("k", Literal.long(9L))), f))
    assert(strict.allRowsMatch(bind(E.lt("k", Literal.long(10L))), f))
    assert(!strict.allRowsMatch(bind(E.lt("k", Literal.long(9L))), f))
    assert(!strict.allRowsMatch(bind(E.gt("k", Literal.long(5L))), f))
    assert(strict.allRowsMatch(bind(E.notEqual("k", Literal.long(12L))), f))
    assert(!strict.allRowsMatch(bind(E.notEqual("k", Literal.long(7L))), f))
  }

  test("double comparisons need a zero NaN count; NaN-free file is provable") {
    val bounds = (Map(3 -> Literal.double(1.0)), Map(3 -> Literal.double(2.0)))
    val noNan = df(10, valueCounts = Map(3 -> 10L), nullCounts = Map(3 -> 0L),
      nanCounts = Map(3 -> 0L), lower = bounds._1, upper = bounds._2)
    val unknownNan = df(10, valueCounts = Map(3 -> 10L), nullCounts = Map(3 -> 0L),
      lower = bounds._1, upper = bounds._2)
    val e = E.ltEq("x", Literal.double(2.0))
    assert(strict.allRowsMatch(bind(e), noNan))
    assert(!strict.allRowsMatch(bind(e), unknownNan),
      "NaN-unknown float file must not prove a comparison (NaN sorts above all)")
  }

  test("equality is strict only when both bounds pin the single value") {
    val f = df(4, valueCounts = Map(2 -> 4L), nullCounts = Map(2 -> 0L),
      lower = Map(2 -> Literal.string("EUROPE")), upper = Map(2 -> Literal.string("EUROPE")))
    assert(strict.allRowsMatch(bind(E.equal("s", Literal.string("EUROPE"))), f))
    assert(strict.allRowsMatch(bind(E.in("s", Seq("ASIA", "EUROPE").map(Literal.string))), f))
    assert(!strict.allRowsMatch(bind(E.equal("s", Literal.string("ASIA"))), f))
    val span = df(4, valueCounts = Map(2 -> 4L), nullCounts = Map(2 -> 0L),
      lower = Map(2 -> Literal.string("ASIA")), upper = Map(2 -> Literal.string("EUROPE")))
    assert(!strict.allRowsMatch(bind(E.equal("s", Literal.string("ASIA"))), span))
  }

  test("IS NULL strict needs value==null counts; NOT over a pred uses inclusive refutation") {
    val allNull = df(5, valueCounts = Map(2 -> 5L), nullCounts = Map(2 -> 5L))
    assert(strict.allRowsMatch(bind(E.isNull("s")), allNull))
    assert(!strict.allRowsMatch(bind(E.notNull("s")), allNull))
    // NOT(k < 5) == k >= 5 after bind; provable from lower bound
    val f = df(10, lower = Map(1 -> Literal.long(5L)), upper = Map(1 -> Literal.long(9L)))
    assert(strict.allRowsMatch(bind(E.not(E.lt("k", Literal.long(5L)))), f))
  }

  test("strict NOT over a composite needs null-free operands (NULL fails both c and NOT c)") {
    // bounds [A, B] refute s IN ('X','Y') inclusively — but 2 null rows
    // evaluate the predicate to NULL, and NOT(NULL) is NULL, not TRUE:
    // those rows do NOT match the negation, so strict must refuse
    val notIn = E.not(E.or(
      E.equal("s", Literal.string("X")), E.equal("s", Literal.string("Y"))))
    val withNulls = df(10, valueCounts = Map(2 -> 10L), nullCounts = Map(2 -> 2L),
      lower = Map(2 -> Literal.string("A")), upper = Map(2 -> Literal.string("B")))
    assert(!strict.allRowsMatch(bind(notIn), withNulls),
      "null rows fail NOT(c) too — refusal required")
    val noNulls = df(10, valueCounts = Map(2 -> 10L), nullCounts = Map(2 -> 0L),
      lower = Map(2 -> Literal.string("A")), upper = Map(2 -> Literal.string("B")))
    assert(strict.allRowsMatch(bind(notIn), noNulls))
  }

  test("truncateUpper drops carry-shortened bounds so short uppers are provably exact") {
    import graft.ice.write.Metrics
    // 16th code point is U+10FFFF: increment must carry into position 15,
    // shortening the bound — ambiguous with an exact short max, so the
    // writer drops it entirely
    val carry = "a" * 15 + new String(Character.toChars(Character.MAX_CODE_POINT)) + "zzz"
    assert(Metrics.truncateUpper(Literal.string(carry)).isEmpty)
    // ordinary truncation increments in place and keeps the full width
    val plain = "b" * 20
    val up = Metrics.truncateUpper(Literal.string(plain))
    assert(up.exists { l =>
      val s = l.raw.asInstanceOf[String]
      s.codePointCount(0, s.length) == Metrics.BoundTruncateLength && s > plain.take(16)
    })
    // binary: a 0xff at the boundary carries and is dropped the same way
    val bcarry = Array.fill[Byte](15)(1) ++ Array.fill[Byte](5)(0xff.toByte)
    assert(Metrics.truncateUpper(Literal.binary(bcarry)).isEmpty)
  }

  test("startsWith: both bounds sharing the prefix prove it; split bounds refuse") {
    val f = df(3, valueCounts = Map(2 -> 3L), nullCounts = Map(2 -> 0L),
      lower = Map(2 -> Literal.string("1-URGENT")), upper = Map(2 -> Literal.string("1-URGENT")))
    assert(strict.allRowsMatch(bind(E.startsWith("s", "1-")), f))
    val g = df(3, valueCounts = Map(2 -> 3L), nullCounts = Map(2 -> 0L),
      lower = Map(2 -> Literal.string("1-URGENT")), upper = Map(2 -> Literal.string("2-HIGH")))
    assert(!strict.allRowsMatch(bind(E.startsWith("s", "1-")), g))
    // NOT startsWith: whole file above the prefix block
    val h = df(3, valueCounts = Map(2 -> 3L), nullCounts = Map(2 -> 0L),
      lower = Map(2 -> Literal.string("4-LOW")), upper = Map(2 -> Literal.string("5-LOW")))
    assert(strict.allRowsMatch(bind(E.not(E.startsWith("s", "1-"))), h))
  }
}
