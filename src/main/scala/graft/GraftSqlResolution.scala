package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
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
