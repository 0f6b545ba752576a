package graft.ice.meta

/** Commit requirements (reference: table_requirement.h:43-189): semantic
  * preconditions validated against the CURRENT table metadata on every
  * commit attempt, including after an optimistic retry refresh. The
  * version CAS alone serializes commits but cannot distinguish a safe
  * re-apply (fast-append after someone else's append) from a real
  * conflict (a schema builder whose field list was computed against a
  * schema that no longer exists) — requirements are that distinction. */
sealed trait TableRequirement {
  /** Violation message, or None when satisfied. */
  def check(base: TableMetadata): Option[String]
}

/** The table must NOT exist yet — the first commit of a staged create
  * (REST `assert-create`). Checking it against any existing metadata is
  * by definition a violation; the REST server short-circuits it before
  * loading (a missing table cannot produce a base to check against). */
case object AssertCreate extends TableRequirement {
  def check(base: TableMetadata): Option[String] =
    Some("table already exists (assert-create)")
}

final case class AssertTableUuid(uuid: String) extends TableRequirement {
  def check(base: TableMetadata): Option[String] =
    if (base.tableUuid == uuid) None
    else Some(s"table UUID changed: expected $uuid, found ${base.tableUuid}")
}

/** The ref must point at the given snapshot (None = ref must not exist). */
final case class AssertRefSnapshotId(ref: String, snapshotId: Option[Long])
    extends TableRequirement {
  def check(base: TableMetadata): Option[String] = {
    val actual = base.ref(ref).map(_.snapshotId)
    if (actual == snapshotId) None
    else Some(s"ref $ref changed: expected $snapshotId, found $actual")
  }
}

final case class AssertCurrentSchemaId(schemaId: Int) extends TableRequirement {
  def check(base: TableMetadata): Option[String] =
    if (base.currentSchemaId == schemaId) None
    else Some(s"current schema changed: expected $schemaId, found ${base.currentSchemaId}")
}

final case class AssertDefaultSpecId(specId: Int) extends TableRequirement {
  def check(base: TableMetadata): Option[String] =
    if (base.defaultSpecId == specId) None
    else Some(s"default spec changed: expected $specId, found ${base.defaultSpecId}")
}

final case class AssertDefaultSortOrderId(orderId: Int) extends TableRequirement {
  def check(base: TableMetadata): Option[String] =
    if (base.defaultSortOrderId == orderId) None
    else Some(s"default sort order changed: expected $orderId, found ${base.defaultSortOrderId}")
}

final case class AssertLastAssignedFieldId(fieldId: Int) extends TableRequirement {
  def check(base: TableMetadata): Option[String] =
    if (base.lastColumnId == fieldId) None
    else Some(s"last column id changed: expected $fieldId, found ${base.lastColumnId}")
}

final case class AssertLastAssignedPartitionId(partitionId: Int) extends TableRequirement {
  def check(base: TableMetadata): Option[String] =
    if (base.lastPartitionId == partitionId) None
    else Some(s"last partition id changed: expected $partitionId, found ${base.lastPartitionId}")
}

/** Thrown when a requirement fails — a REAL conflict; retrying cannot
  * help, the caller must rebuild its update from fresh metadata. */
class RequirementFailedException(msg: String)
  extends graft.ice.catalog.CommitFailedException(msg)
