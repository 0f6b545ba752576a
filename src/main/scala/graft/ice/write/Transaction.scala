package graft.ice.write

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ice._
import graft.ice.meta._

/** Multi-operation transaction (reference: transaction.h:31-51): stages
  * any number of table updates and applies them in ONE atomic catalog
  * version bump — a crash or lost race leaves either all effects or none
  * visible, never an intermediate state.
  *
  * Data files for staged appends are written immediately (they are
  * invisible until a snapshot references them); the metadata swap is the
  * only commit point. On a lost optimistic-concurrency race the whole
  * update chain re-applies against the refreshed base, and any staged
  * requirement (TableRequirement, C5) re-validates first — so a
  * transaction built on assumptions that no longer hold aborts instead
  * of committing a corrupted state. */
final class Transaction(table: IceTable, spark: SparkSession) {

  private val ops =
    scala.collection.mutable.ArrayBuffer[TableMetadata => TableMetadata]()
  private val reqs = scala.collection.mutable.ArrayBuffer[TableRequirement]()
  private var committed = false
  private var appendedSnapshot: Option[Snapshot] = None

  private def stage(fn: TableMetadata => TableMetadata): Transaction = {
    require(!committed, "transaction already committed")
    ops += fn; this
  }

  /** Stage an append: files are written NOW, the snapshot becomes visible
    * only at commitTransaction. */
  def append(df: DataFrame): Transaction = {
    val op = new AppendOp(table, spark)
    val (entries, uuid) = op.writeEntries(df)
    stage(op.appendUpdate(entries, uuid, s => appendedSnapshot = Some(s)))
  }

  def setProperty(key: String, value: String): Transaction =
    stage(m => m.copy(properties = m.properties + (key -> value),
      lastUpdatedMs = System.currentTimeMillis()))

  def removeProperty(key: String): Transaction =
    stage(m => m.copy(properties = m.properties - key,
      lastUpdatedMs = System.currentTimeMillis()))

  /** Stage an arbitrary metadata update (schema/spec/ref changes built
    * elsewhere can compose through this). */
  def update(fn: TableMetadata => TableMetadata): Transaction = stage(fn)

  /** Stage a requirement checked against the base on EVERY attempt
    * (including after refresh on a lost race). */
  def requirement(r: TableRequirement): Transaction = {
    require(!committed, "transaction already committed")
    reqs += r; this
  }

  /** Apply all staged operations in order as one commit. */
  def commitTransaction(): TableMetadata = {
    require(!committed, "transaction already committed")
    val result = table.commit(reqs.toSeq,
      base => ops.foldLeft(base)((m, fn) => fn(m)), -1)
    committed = true
    result
  }

  /** The snapshot created by the last staged append, after commit. */
  def committedSnapshot: Option[Snapshot] = appendedSnapshot.filter(_ => committed)
}
