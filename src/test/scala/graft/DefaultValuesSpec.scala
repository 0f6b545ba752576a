package graft

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ice._
import graft.ice.catalog._
import graft.ice.meta._
import graft.ice.types._

/** v3 default values (spec "Default values" + Appendix D single-value
  * JSON). The reference declares the JSON keys (json_internal.cc:78-79)
  * but implements neither serde nor read/write semantics; here both are
  * executable: initial-default injection on scan for files that predate
  * the column (proven from manifest valueCounts — no file opened) and
  * write-default materialization for appends that omit the column. */
class DefaultValuesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-defaults-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmpWarehouse(): String =
    java.nio.file.Files.createTempDirectory("warehouse").toString

  private val sfDir = "/root/testdata/sf0.001"

  // ---- single-value JSON serde ----

  test("single-value JSON round-trips every primitive type") {
    val cases: Seq[(IcePrimitive, Any, String)] = Seq(
      (BooleanT, true, "true"),
      (IntT, 34, "34"),
      (LongT, 34L, "34"),
      (FloatT, 1.5f, "1.5"),
      (DoubleT, 8.75d, "8.75"),
      (DecimalT(9, 2), new JBigDecimal("14.20"), "\"14.20\""),
      (DateT, 17486, "\"2017-11-16\""), // 2017-11-16
      (TimeT, 81068123456L, "\"22:31:08.123456\""),
      (TimestampT, 1510871468123456L, "\"2017-11-16T22:31:08.123456\""),
      (TimestampTzT, 1510871468123456L, "\"2017-11-16T22:31:08.123456+00:00\""),
      (StringT, "iceberg", "\"iceberg\""),
      (UuidT, java.util.UUID.fromString("f79c3e09-677c-4bbd-a479-3f349cb785e7"),
        "\"f79c3e09-677c-4bbd-a479-3f349cb785e7\""),
      (FixedT(2), Array[Byte](0, -1), "\"00FF\""),
      (BinaryT, Array[Byte](1, 2), "\"0102\""))
    cases.foreach { case (t, v, expectJson) =>
      val n = SingleValueJson.toJson(t, v)
      assert(n.toString == expectJson, s"serialize $t")
      val back = SingleValueJson.fromJson(t, n)
      (v, back) match {
        case (a: Array[Byte], b: Array[Byte]) => assert(a.sameElements(b), s"round-trip $t")
        case (a, b) => assert(a == b, s"round-trip $t")
      }
    }
  }

  test("single-value JSON handles nested types (struct keyed by field id, map as keys/values)") {
    val st = StructT(IndexedSeq(
      NestedField(1, "a", IntT, required = true),
      NestedField(2, "b", StringT, required = false)))
    val n = SingleValueJson.toJson(st, IndexedSeq(1, "bar"))
    assert(n.toString == """{"1":1,"2":"bar"}""")
    assert(SingleValueJson.fromJson(st, n) == IndexedSeq(1, "bar"))

    val lt = ListT(3, IntT, elementRequired = true)
    assert(SingleValueJson.toJson(lt, Seq(1, 2)).toString == "[1,2]")
    assert(SingleValueJson.fromJson(lt, SingleValueJson.toJson(lt, Seq(1, 2))) == Seq(1, 2))

    val mt = MapT(4, IntT, 5, StringT, valueRequired = false)
    val mv: Seq[(Any, Any)] = Seq(1 -> "x", 2 -> "y")
    assert(SingleValueJson.toJson(mt, mv).toString == """{"keys":[1,2],"values":["x","y"]}""")
    assert(SingleValueJson.fromJson(mt, SingleValueJson.toJson(mt, mv)) == mv)
  }

  test("schema JSON round-trips initial-default and write-default") {
    val schema = Schema(1, IndexedSeq(
      NestedField(1, "id", LongT, required = true),
      NestedField(2, "tier", StringT, required = false,
        initialDefault = Some("STANDARD"), writeDefault = Some("BASIC")),
      NestedField(3, "score", IntT, required = false,
        initialDefault = Some(7), writeDefault = Some(42))))
    val json = MetaJson.schemaToJson(schema).toString
    assert(json.contains("\"initial-default\":\"STANDARD\""))
    assert(json.contains("\"write-default\":42"))
    val back = MetaJson.schemaFromJson(MetaJson.mapper.readTree(json))
    assert(back == schema)
  }

  // ---- end-to-end semantics ----

  test("initial-default surfaces for pre-evolution files; write-default materializes on append") {
    val cat = new DirCatalog(tmpWarehouse())
    val raw = spark.read.parquet(s"$sfDir/supplier.parquet")
    val t = IceTable.create(cat, TableIdentifier.parse("db.s"),
      SparkConv.fromSpark(raw.schema))
    t.append(spark).appendDataFrame(raw.filter("s_suppkey % 2 = 0"))
    t.updateSchema()
      .addColumnWithDefault("tier", StringT, Some("STANDARD"), Some("BASIC"))
      .addRequiredColumn("flag", BooleanT, initialDefault = true)
      .commit()
    val t2 = IceTable.load(cat, TableIdentifier.parse("db.s"))
    t2.append(spark).appendDataFrame(raw.filter("s_suppkey % 2 = 1"))

    val rows = t2.newScan().select("s_suppkey", "tier", "flag").toDF(spark)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    val n = raw.count()
    assert(rows.size == n)
    rows.foreach { case (k, (tier, flag)) =>
      if (k % 2 == 0) assert(tier == "STANDARD" && flag, s"pre-evolution row $k")
      else assert(tier == "BASIC" && flag, s"post-evolution row $k")
    }
    // the default is metadata-injected, not materialized: batch-1 files
    // must not contain the column
    val preFiles = t2.newScan().planFiles().map(_.file)
      .filter(f => !f.valueCounts.keySet.exists(_ > raw.schema.size))
    assert(preFiles.nonEmpty, "expected files that predate the evolution")

    // reload from disk: defaults survive the metadata JSON round trip
    val t3 = IceTable.load(cat, TableIdentifier.parse("db.s"))
    val tierField = t3.schema.fields.find(_.name == "tier").get
    assert(tierField.initialDefault == Some("STANDARD"))
    assert(tierField.writeDefault == Some("BASIC"))
    val again = t3.newScan().select("s_suppkey", "tier").toDF(spark)
      .filter("tier = 'STANDARD'").count()
    assert(again == rows.count(_._1 % 2 == 0))
  }

  test("typed defaults: date, timestamp, decimal, binary inject correctly") {
    val cat = new DirCatalog(tmpWarehouse())
    val raw = spark.read.parquet(s"$sfDir/region.parquet")
    val t = IceTable.create(cat, TableIdentifier.parse("db.r"),
      SparkConv.fromSpark(raw.schema))
    t.append(spark).appendDataFrame(raw)
    t.updateSchema()
      .addColumnWithDefault("d", DateT, Some(17486), Some(17486))
      .addColumnWithDefault("ts", TimestampT, Some(1510871468123456L), None)
      .addColumnWithDefault("dec", DecimalT(9, 2), Some(new JBigDecimal("14.20")), None)
      .addColumnWithDefault("bin", BinaryT, Some(Array[Byte](1, 2)), None)
      .commit()
    val t2 = IceTable.load(cat, TableIdentifier.parse("db.r"))
    val row = t2.newScan().select("d", "ts", "dec", "bin").toDF(spark).head
    assert(row.getDate(0).toString == "2017-11-16")
    assert(row.getAs[java.time.LocalDateTime](1).toString == "2017-11-16T22:31:08.123456")
    assert(row.getDecimal(2) == new JBigDecimal("14.20"))
    assert(row.getAs[Array[Byte]](3).sameElements(Array[Byte](1, 2)))
  }

  test("SQL surface: CREATE/ALTER DEFAULT, INSERT default fill, V2 scan injection") {
    val wh = tmpWarehouse()
    spark.conf.set("spark.sql.catalog.icedef", "graft.ice.connector.GraftCatalogPlugin")
    spark.conf.set("spark.sql.catalog.icedef.warehouse", wh)

    // CREATE TABLE with a DEFAULT column: INSERT with a column list fills it
    spark.sql("CREATE TABLE icedef.db.c (id BIGINT, tier STRING DEFAULT 'X')")
    spark.sql("INSERT INTO icedef.db.c (id) VALUES (1), (2)")
    assert(spark.sql("SELECT tier FROM icedef.db.c").collect()
      .forall(_.getString(0) == "X"))

    // ALTER ADD COLUMN DEFAULT: old files read the initial-default via
    // V2 scan injection; SET DEFAULT moves only the write-default
    spark.sql("CREATE TABLE icedef.db.d (id BIGINT)")
    spark.sql("INSERT INTO icedef.db.d VALUES (10), (11)")
    spark.sql("ALTER TABLE icedef.db.d ADD COLUMN tier STRING DEFAULT 'STANDARD'")
    spark.sql("ALTER TABLE icedef.db.d ALTER COLUMN tier SET DEFAULT 'BASIC'")
    spark.sql("INSERT INTO icedef.db.d (id) VALUES (20)")
    val got = spark.sql("SELECT id, tier FROM icedef.db.d").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(10L -> "STANDARD", 11L -> "STANDARD", 20L -> "BASIC"))

    // filtering on the injected column works (residual filter over the
    // virtual value, old files kept by the conservative evaluator)
    assert(spark.sql("SELECT count(*) FROM icedef.db.d WHERE tier = 'STANDARD'")
      .head.getLong(0) == 2L)
  }

  test("required column without input and without write-default is rejected") {
    val cat = new DirCatalog(tmpWarehouse())
    val raw = spark.read.parquet(s"$sfDir/region.parquet")
    val t = IceTable.create(cat, TableIdentifier.parse("db.r2"),
      SparkConv.fromSpark(raw.schema))
    t.updateSchema()
      .addColumnWithDefault("req", IntT, Some(1), None)
      .commit()
    val t2 = IceTable.load(cat, TableIdentifier.parse("db.r2"))
    // optional column missing from input with no write-default -> null, accepted
    t2.append(spark).appendDataFrame(raw)
    val nulls = t2.newScan().select("req").toDF(spark).filter("req IS NULL").count()
    assert(nulls == raw.count(), "no write-default -> nulls for appended rows")
  }
}
