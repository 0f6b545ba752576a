package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.unsafe.types.UTF8String

import graft.ice.{IceTable, ScanBuilder}
import graft.ice.catalog.{DirCatalog, TableIdentifier}

/** Pure-SQL access to graft tables: an analyzer rule (injected via
  * `spark.sql.extensions=graft.GraftExtensions`) resolves
  *
  *   SELECT ... FROM graft.<ns...>.<table>
  *   SELECT ... FROM graft.<ns...>.<table> VERSION AS OF <snapshotId|branch|tag>
  *   SELECT ... FROM graft.<ns...>.<table> TIMESTAMP AS OF '<ts>'
  *
  * against the warehouse named by the `spark.graft.warehouse` session
  * conf. The substituted subtree is the SAME plan `IceTable.newScan()
  * .toDF` builds — metadata pruning, MoR deletes, schema evolution and
  * time travel all behave identically in SQL and in the Scala API (the
  * Spark-first counterpart of the reference's catalog lookup path,
  * catalog.h:108-136, which has no query engine to hand the table to).
  *
  * This is deliberately a RESOLUTION rule, not a DSv2 connector: the
  * scan subtree Catalyst receives is ordinary parquet relations plus
  * our anti-join delete shaping, so every downstream optimization
  * (filter pushdown into the parquet scan, column pruning, AQE) applies
  * unchanged — nothing new to teach the optimizer. */
final case class GraftTableResolution(session: SparkSession) extends Rule[LogicalPlan] {

  private val ConfKey = "spark.graft.warehouse"

  private def active: Boolean = session.conf.getOption(ConfKey).isDefined

  private def isGraft(parts: Seq[String]): Boolean =
    parts.length >= 2 && parts.head.equalsIgnoreCase("graft") && active

  private def scanPlan(parts: Seq[String],
      shape: ScanBuilder => ScanBuilder): LogicalPlan = {
    val cat = new DirCatalog(session.conf.get(ConfKey))
    val t = IceTable.load(cat,
      TableIdentifier(parts.slice(1, parts.length - 1), parts.last))
    val df = shape(t.newScan()).toDF(session)
    // alias so `FROM graft.db.t` rows are addressable as `t.col`
    SubqueryAlias(parts.last, df.queryExecution.analyzed)
  }

  /** `TIMESTAMP AS OF` operand → epoch millis. The parser hands a
    * literal (string or already-cast timestamp); session timezone is
    * UTC project-wide. */
  private def tsMillis(e: Expression): Long = e.eval() match {
    case micros: java.lang.Long => micros / 1000L
    case s: UTF8String =>
      val str = s.toString.trim
      val ldt =
        if (str.contains(" ") || str.contains("T"))
          java.time.LocalDateTime.parse(str.replace(' ', 'T'))
        else java.time.LocalDate.parse(str).atStartOfDay()
      ldt.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    case other => throw new IllegalArgumentException(
      s"cannot interpret TIMESTAMP AS OF operand: $other")
  }

  // top-down: RelationTimeTravel must be seen BEFORE its child
  // UnresolvedRelation, or the bare-relation case would swallow the
  // time-travel clause
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsDown {
    case InsertIntoStatement(u: UnresolvedRelation, partSpec, userCols, query, overwrite, _, byName)
        if isGraft(u.multipartIdentifier) =>
      require(partSpec.isEmpty,
        "static PARTITION clauses are not supported: graft tables take " +
          "their partitioning from the table spec (dynamic on overwrite)")
      GraftInsertCommand(session.conf.get(ConfKey), u.multipartIdentifier,
        query, overwrite, userCols, byName)
    case u: UnresolvedRelation if isGraft(u.multipartIdentifier) =>
      scanPlan(u.multipartIdentifier, identity)
    case RelationTimeTravel(u: UnresolvedRelation, ts, version)
        if isGraft(u.multipartIdentifier) =>
      (version, ts) match {
        case (Some(v), _) if v.forall(_.isDigit) =>
          scanPlan(u.multipartIdentifier, _.useSnapshot(v.toLong))
        case (Some(ref), _) => // branch or tag name
          scanPlan(u.multipartIdentifier, _.useRef(ref))
        case (None, Some(e)) =>
          scanPlan(u.multipartIdentifier, _.asOfTimestamp(tsMillis(e)))
        case (None, None) => scanPlan(u.multipartIdentifier, identity)
      }
  }
}

/** `INSERT INTO|OVERWRITE graft.<ns>.<t> <query>`: the source query is
  * analyzed and executed at run time, then committed through the same
  * append/overwrite snapshot producers as the Scala API — one atomic
  * commit, retried under the C5 protocol like any other writer. INSERT
  * OVERWRITE is dynamic-partition overwrite on partitioned tables and
  * truncate-and-load on unpartitioned ones (the Hive-compatible
  * semantics Spark users expect). */
final case class GraftInsertCommand(warehouse: String, parts: Seq[String],
    query: LogicalPlan, overwrite: Boolean, userCols: Seq[String],
    byName: Boolean = false)
    extends LeafRunnableCommand {

  override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans.QueryPlan[_]] = Seq(query)

  override def run(session: SparkSession): Seq[Row] = {
    val t = IceTable.load(new DirCatalog(warehouse),
      TableIdentifier(parts.slice(1, parts.length - 1), parts.last))
    var df = org.apache.spark.sql.GraftColumnBridge.ofRows(session, query)
    // SQL INSERT is positional; a column list reorders/subsets, with
    // unmentioned table columns going NULL
    val target = t.schema.fields.map(_.name)
    if (byName) {
      // INSERT BY NAME: the query's column names drive the mapping;
      // unmentioned table columns go NULL
      var named = df
      target.filterNot(df.columns.contains).foreach(c =>
        named = named.withColumn(c, org.apache.spark.sql.functions.lit(null)))
      df = named.select(target.map(org.apache.spark.sql.functions.col): _*)
    } else if (userCols.nonEmpty) {
      require(userCols.size == df.columns.length,
        s"INSERT column list has ${userCols.size} names but the query " +
          s"produces ${df.columns.length} columns")
      var named = df.toDF(userCols: _*)
      target.filterNot(userCols.contains).foreach(c =>
        named = named.withColumn(c, org.apache.spark.sql.functions.lit(null)))
      df = named.select(target.map(org.apache.spark.sql.functions.col): _*)
    } else {
      require(df.columns.length == target.length,
        s"INSERT query produces ${df.columns.length} columns; the table " +
          s"has ${target.length}")
      df = df.toDF(target.toSeq: _*)
    }
    if (overwrite) {
      if (t.spec.isUnpartitioned) t.overwrite(session).replaceAll(df)
      else t.overwrite(session).dynamic(df)
    } else t.append(session).appendDataFrame(df)
    Seq.empty
  }
}
