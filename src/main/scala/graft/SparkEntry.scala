package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ice.expr.{Expr => E}
import graft.ice.types.Literal

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Every query runs over Iceberg-planned scans (Tables.scan) so the
  * metadata/manifest/pruning stack is exercised end-to-end; the DuckDB
  * oracle runs the equivalent SQL on the raw parquet. Query names map to
  * SURVEY §2 operator rows. */
object SparkEntry {

  /** Flagship: catalog -> table -> filtered+projected Iceberg scan
    * (the reference's demo path, demo_example.cc:41-78). */
  def entry(spark: SparkSession): DataFrame = {
    val sfDir = "/root/testdata/sf0.001"
    Tables.ice(spark, sfDir, "lineitem")
      .newScan()
      .filter(E.gtEq("l_shipdate", Literal.string("2000-01-01")))
      .select("l_orderkey", "l_extendedprice", "l_discount", "l_shipdate")
      .toDF(spark)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S6/S7/S8 + F1-F6: scan planning -> parquet read with filter+projection
    "s6_scan_filter_project" -> ((s, dir) => {
      Tables.ice(s, dir, "lineitem").newScan()
        .filter(E.gtEq("l_shipdate", Literal.string("2000-06-01")))
        .select("l_orderkey", "l_quantity", "l_extendedprice", "l_shipdate")
        .toDF(s)
    }),
    // P1/P2: column selection by name over an Iceberg scan
    "p1_projection" -> ((s, dir) => {
      Tables.ice(s, dir, "customer").newScan()
        .select("c_custkey", "c_name", "c_acctbal").toDF(s)
    }),
    // §2.4 absent-in-reference: aggregation over the Iceberg scan (TPC-H Q1 style)
    "q1_agg" -> ((s, dir) => {
      Tables.scan(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum("l_extendedprice").as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          avg("l_quantity").as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),
    // §2.4: broadcast join over Iceberg scans
    "q_join_broadcast" -> ((s, dir) => {
      val o = Tables.scan(s, dir, "orders")
      val c = Tables.scan(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), sum("o_totalprice").as("revenue"))
    }),
    // §2.5: temporal transform (day) evaluated distributed
    "t_transform_day" -> ((s, dir) => {
      Tables.scan(s, dir, "orders")
        .select(graft.ice.transform.DayTransform
          .toColumn(col("o_orderdate"), graft.ice.types.TimestampT).as("order_day"),
          col("o_orderkey"))
    }),
    // T3: time travel — scan the first of two snapshots
    "t3_time_travel" -> ((s, dir) => {
      val t = TimeTravelFixture.table(s, dir)
      val firstSnap = t.history.head.snapshotId
      t.newScan().useSnapshot(firstSnap).toDF(s)
    })
  )

  def oracleSql: Map[String, String] = Map(
    "s6_scan_filter_project" ->
      """SELECT l_orderkey, l_quantity, l_extendedprice, l_shipdate
        |FROM lineitem WHERE l_shipdate >= TIMESTAMP '2000-06-01 00:00:00'""".stripMargin,
    "p1_projection" ->
      "SELECT c_custkey, c_name, c_acctbal FROM customer",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_base_price,
        |  sum(l_extendedprice * (1.0 - l_discount)) AS sum_disc_price,
        |  avg(l_quantity) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_join_broadcast" ->
      """SELECT c_mktsegment, count(*) AS n_orders, sum(o_totalprice) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "t_transform_day" ->
      """SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS order_day,
        |o_orderkey FROM orders""".stripMargin,
    "t3_time_travel" ->
      "SELECT * FROM orders WHERE o_orderkey % 10 < 5"
  )
}

/** Two-snapshot fixture for time travel: snapshot 1 = orders with
  * o_orderkey%10<5, snapshot 2 adds the rest. Deterministic, so the
  * oracle can reproduce snapshot 1 with a WHERE clause. */
object TimeTravelFixture {
  import graft.ice._
  import graft.ice.catalog._
  import graft.ice.types.SparkConv

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, IceTable]()

  def table(spark: SparkSession, sfDir: String): IceTable =
    cache.computeIfAbsent(sfDir, { _ =>
      val cat = Tables.catalog(sfDir)
      val ident = TableIdentifier(Seq("tpch"), "orders_tt")
      if (cat.tableExists(ident)) IceTable.load(cat, ident)
      else {
        val raw = Tables.raw(spark, sfDir, "orders")
        val t = IceTable.create(cat, ident, SparkConv.fromSpark(raw.schema))
        t.append(spark).appendDataFrame(raw.filter("o_orderkey % 10 < 5"))
        t.append(spark).appendDataFrame(raw.filter("o_orderkey % 10 >= 5"))
        t
      }
    })
}
