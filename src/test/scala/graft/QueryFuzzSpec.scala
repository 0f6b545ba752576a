package graft

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ice._
import graft.ice.catalog._
import graft.ice.expr.{Expr => E}
import graft.ice.meta.{PartitionField, PartitionSpec}
import graft.ice.transform.IdentityTransform
import graft.ice.types.{Literal, SparkConv}

/** Property-style fuzz over the SQL query surface: N seeded-random
  * queries composed of projections, predicates, aggregates, sorts and
  * time travel, each executed through the V2 connector (manifest-planned
  * scan, partition/metrics pruning, MoR delete application, field-id
  * projection) and cross-checked against plain Spark DataFrames that
  * model each snapshot's expected content — two completely different
  * scan paths over the same rows. Converts "the 160 hand-picked queries
  * pass" into "the composed query space passes".
  *
  * The table is identity-partitioned and its history includes a MoR
  * equality delete, a second append and a MoR update — so random
  * predicates constantly cross partition-pruning, bound-pruning and
  * delete-visibility boundaries, where the bugs live. Seed is fixed:
  * failures reproduce exactly; the query SQL is printed on mismatch. */
class QueryFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val N = 220

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("whfuzz").toString

  private lazy val spark = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.catalog.ice", "graft.ice.connector.GraftCatalogPlugin")
      .config("spark.sql.catalog.ice.warehouse", warehouse)
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

  /** (snapshot id, expected-content temp view name) per history state. */
  private lazy val states: Seq[(Long, String)] = {
    val cat = new DirCatalog(warehouse)
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    val schema = SparkConv.fromSpark(orders.schema)
    val statusId = schema.findFieldByName("o_orderstatus").get.id
    val spec = PartitionSpec(0, IndexedSeq(
      PartitionField(statusId, 1000, "status", IdentityTransform)))
    val t = IceTable.create(cat, TableIdentifier.parse("db.fz"), schema, spec,
      properties = Map("write.delete.mode" -> "merge-on-read",
        "write.update.mode" -> "merge-on-read"))

    // s1: full append
    t.append(spark).appendDataFrame(orders)
    val s1 = t.currentSnapshot.get.snapshotId
    val e1 = orders
    e1.createOrReplaceTempView("fz_exp_1")

    // s2: MoR equality delete of every 7th key
    t.delete(spark).deleteByEquality(
      orders.filter("o_orderkey % 7 = 3").select("o_orderkey"))
    val s2 = t.currentSnapshot.get.snapshotId
    val e2 = e1.filter("o_orderkey % 7 != 3")
    e2.createOrReplaceTempView("fz_exp_2")

    // s3: second append with shifted (still-unique) keys
    val shifted = orders.filter("o_orderkey % 5 = 0")
      .withColumn("o_orderkey", col("o_orderkey") + lit(2000000L))
    t.append(spark).appendDataFrame(shifted)
    val s3 = t.currentSnapshot.get.snapshotId
    val e3 = e2.unionByName(shifted)
    e3.createOrReplaceTempView("fz_exp_3")

    // s4: MoR update doubling small order totals
    t.delete(spark).updateWhereMoR(
      E.lt("o_totalprice", Literal.double(50000.0)),
      Map("o_totalprice" -> "o_totalprice * 2"))
    val s4 = t.currentSnapshot.get.snapshotId
    val e4 = e3.withColumn("o_totalprice",
      when(col("o_totalprice") < 50000.0, col("o_totalprice") * 2)
        .otherwise(col("o_totalprice")))
    e4.createOrReplaceTempView("fz_exp_4")

    Seq(s1 -> "fz_exp_1", s2 -> "fz_exp_2", s3 -> "fz_exp_3", s4 -> "fz_exp_4")
  }

  // ---- generator ----

  private def predicate(rnd: Random): String = {
    def clause(): String = rnd.nextInt(7) match {
      case 0 => s"o_orderkey % ${2 + rnd.nextInt(9)} = ${rnd.nextInt(3)}"
      case 1 => s"o_totalprice ${Seq("<", ">=", "<=")(rnd.nextInt(3))} " +
        s"${1000 + rnd.nextInt(400000)}"
      case 2 =>
        val all = Seq("'O'", "'F'", "'P'")
        val pick = rnd.shuffle(all).take(1 + rnd.nextInt(2))
        s"o_orderstatus IN (${pick.mkString(", ")})"
      case 3 => s"o_orderdate ${if (rnd.nextBoolean()) "<" else ">="} " +
        s"TIMESTAMP '199${2 + rnd.nextInt(7)}-0${1 + rnd.nextInt(9)}-15 00:00:00'"
      case 4 => s"o_orderpriority LIKE '${1 + rnd.nextInt(5)}%'"
      case 5 =>
        val a = rnd.nextInt(1400); val b = a + 1 + rnd.nextInt(200)
        s"o_custkey BETWEEN $a AND $b"
      case _ => s"o_orderkey ${if (rnd.nextBoolean()) ">" else "<="} " +
        s"${rnd.nextInt(3000000)}"
    }
    val n = 1 + rnd.nextInt(3)
    (0 until n).map(_ => clause())
      .mkString(if (rnd.nextBoolean()) " AND " else " OR ")
  }

  private val projectable = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  /** One random query body; `src` is substituted for the FROM source. */
  private def queryFor(rnd: Random, src: String): String = {
    val pred = predicate(rnd)
    if (rnd.nextInt(3) == 0) {
      // aggregate: decimal-cast sums keep float association order out
      val grp = Seq("o_orderstatus", "o_orderpriority")(rnd.nextInt(2))
      s"SELECT $grp, count(*) AS cnt, " +
        "sum(cast(o_totalprice AS decimal(18,2))) AS total, " +
        "min(o_orderkey) AS mn, max(o_custkey) AS mx " +
        s"FROM $src WHERE $pred GROUP BY $grp"
    } else {
      val cols = rnd.shuffle(projectable).take(1 + rnd.nextInt(4))
      val proj = (cols :+ "o_orderkey").distinct.mkString(", ")
      val tail =
        if (rnd.nextInt(3) == 0)
          // o_orderkey is unique at every snapshot: total order, so
          // LIMIT is deterministic and comparable in order
          s" ORDER BY o_orderkey ${if (rnd.nextBoolean()) "DESC" else ""} " +
            s"LIMIT ${1 + rnd.nextInt(500)}"
        else ""
      s"SELECT $proj FROM $src WHERE $pred$tail"
    }
  }

  test(s"$N seeded-random queries match plain-Spark oracles across " +
      "snapshots (projections, predicates, aggregates, sorts, time travel)") {
    val st = states
    val rnd = new Random(20260817L)
    var failures = List.empty[String]
    (1 to N).foreach { i =>
      val (sid, expView) = st(rnd.nextInt(st.size))
      // ONE random stream drives both renders: draw the query as a
      // template, then substitute each source
      val template = queryFor(rnd, "__SRC__")
      val ordered = template.contains("ORDER BY")
      val onIce = template.replace("__SRC__",
        s"(SELECT * FROM ice.db.fz VERSION AS OF $sid)")
      val onExp = template.replace("__SRC__", expView)
      val got = spark.sql(onIce).collect().map(_.toString)
      val want = spark.sql(onExp).collect().map(_.toString)
      val (g, w) = if (ordered) (got.toSeq, want.toSeq)
        else (got.sorted.toSeq, want.sorted.toSeq)
      if (g != w) {
        failures ::= s"query #$i mismatch (${g.size} vs ${w.size} rows)\n  $onIce"
      }
    }
    assert(failures.isEmpty,
      s"${failures.size}/$N fuzz queries diverged:\n${failures.take(5).mkString("\n")}")
  }
}
