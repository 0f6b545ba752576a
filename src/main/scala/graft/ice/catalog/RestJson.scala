package graft.ice.catalog

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.ice.meta._

/** Iceberg REST catalog protocol serde (C3). The reference declares the
  * request/response surface (catalog/rest/types.h:37-121) but implements
  * only GetConfig/ListNamespaces over cpr (rest_catalog.cc:31-43); here
  * the full surface is wire-real, including the change-based commit the
  * reference has no type for: a commit travels as TableRequirement +
  * MetadataUpdate lists (the public rest-catalog-open-api.yaml shapes),
  * NOT as a whole metadata JSON — the server owns the authoritative
  * metadata and applies updates to its current base.
  *
  * Namespace levels inside a URL path are joined by the unit separator
  * 0x1F and percent-encoded (`a%1Fb`), per the public REST spec.
  */
object RestJson {
  private val mapper = MetaJson.mapper

  // ---------- metadata updates (change-based commit) ----------

  /** One metadata change (public spec MetadataUpdate union). */
  sealed trait MetadataUpdate
  final case class AssignUuid(uuid: String) extends MetadataUpdate
  final case class UpgradeFormatVersion(formatVersion: Int) extends MetadataUpdate
  final case class AddSchema(schema: graft.ice.types.Schema) extends MetadataUpdate
  /** -1 = the schema added last in this same commit. */
  final case class SetCurrentSchema(schemaId: Int) extends MetadataUpdate
  final case class AddPartitionSpec(spec: PartitionSpec) extends MetadataUpdate
  final case class SetDefaultSpec(specId: Int) extends MetadataUpdate
  final case class AddSortOrder(order: SortOrder) extends MetadataUpdate
  final case class SetDefaultSortOrder(orderId: Int) extends MetadataUpdate
  final case class AddSnapshot(snapshot: Snapshot) extends MetadataUpdate
  final case class SetSnapshotRef(name: String, ref: SnapshotRef) extends MetadataUpdate
  final case class RemoveSnapshots(snapshotIds: Seq[Long]) extends MetadataUpdate
  final case class RemoveSnapshotRef(name: String) extends MetadataUpdate
  final case class SetLocation(location: String) extends MetadataUpdate
  final case class SetProperties(updates: Map[String, String]) extends MetadataUpdate
  final case class RemoveProperties(removals: Seq[String]) extends MetadataUpdate
  final case class SetStatistics(statistics: StatisticsFile) extends MetadataUpdate
  final case class RemoveStatistics(snapshotId: Long) extends MetadataUpdate
  final case class SetPartitionStatistics(partitionStatistics: PartitionStatisticsFile) extends MetadataUpdate
  final case class RemovePartitionStatistics(snapshotId: Long) extends MetadataUpdate

  def updateToJson(u: MetadataUpdate): ObjectNode = {
    val o = mapper.createObjectNode()
    u match {
      case AssignUuid(uuid) =>
        o.put("action", "assign-uuid"); o.put("uuid", uuid)
      case UpgradeFormatVersion(v) =>
        o.put("action", "upgrade-format-version"); o.put("format-version", v)
      case AddSchema(s) =>
        o.put("action", "add-schema"); o.set[ObjectNode]("schema", MetaJson.schemaToJson(s))
      case SetCurrentSchema(id) =>
        o.put("action", "set-current-schema"); o.put("schema-id", id)
      case AddPartitionSpec(s) =>
        o.put("action", "add-spec"); o.set[ObjectNode]("spec", MetaJson.specToJson(s))
      case SetDefaultSpec(id) =>
        o.put("action", "set-default-spec"); o.put("spec-id", id)
      case AddSortOrder(s) =>
        o.put("action", "add-sort-order"); o.set[ObjectNode]("sort-order", MetaJson.sortOrderToJson(s))
      case SetDefaultSortOrder(id) =>
        o.put("action", "set-default-sort-order"); o.put("sort-order-id", id)
      case AddSnapshot(s) =>
        o.put("action", "add-snapshot"); o.set[ObjectNode]("snapshot", MetaJson.snapshotToJson(s))
      case SetSnapshotRef(name, r) =>
        o.put("action", "set-snapshot-ref"); o.put("ref-name", name)
        val rj = MetaJson.refToJson(r)
        rj.properties.asScala.foreach(e => o.set[ObjectNode](e.getKey, e.getValue))
      case RemoveSnapshots(ids) =>
        o.put("action", "remove-snapshots")
        val a = o.putArray("snapshot-ids"); ids.foreach(a.add)
      case RemoveSnapshotRef(name) =>
        o.put("action", "remove-snapshot-ref"); o.put("ref-name", name)
      case SetLocation(loc) =>
        o.put("action", "set-location"); o.put("location", loc)
      case SetProperties(m) =>
        o.put("action", "set-properties")
        val p = o.putObject("updates"); m.foreach { case (k, v) => p.put(k, v) }
      case RemoveProperties(ks) =>
        o.put("action", "remove-properties")
        val a = o.putArray("removals"); ks.foreach(a.add)
      case SetStatistics(sf) =>
        o.put("action", "set-statistics")
        o.put("snapshot-id", sf.snapshotId)
        o.set[ObjectNode]("statistics", MetaJson.statisticsToJson(sf))
      case RemoveStatistics(id) =>
        o.put("action", "remove-statistics"); o.put("snapshot-id", id)
      case SetPartitionStatistics(psf) =>
        o.put("action", "set-partition-statistics")
        val po = o.putObject("partition-statistics")
        po.put("snapshot-id", psf.snapshotId)
        po.put("statistics-path", psf.path)
        po.put("file-size-in-bytes", psf.fileSizeInBytes)
      case RemovePartitionStatistics(id) =>
        o.put("action", "remove-partition-statistics"); o.put("snapshot-id", id)
    }
    o
  }

  def updateFromJson(n: JsonNode): MetadataUpdate = n.get("action").asText match {
    case "assign-uuid" => AssignUuid(n.get("uuid").asText)
    case "upgrade-format-version" => UpgradeFormatVersion(n.get("format-version").asInt)
    case "add-schema" => AddSchema(MetaJson.schemaFromJson(n.get("schema")))
    case "set-current-schema" => SetCurrentSchema(n.get("schema-id").asInt)
    case "add-spec" => AddPartitionSpec(MetaJson.specFromJson(n.get("spec")))
    case "set-default-spec" => SetDefaultSpec(n.get("spec-id").asInt)
    case "add-sort-order" => AddSortOrder(MetaJson.sortOrderFromJson(n.get("sort-order")))
    case "set-default-sort-order" => SetDefaultSortOrder(n.get("sort-order-id").asInt)
    case "add-snapshot" => AddSnapshot(MetaJson.snapshotFromJson(n.get("snapshot")))
    case "set-snapshot-ref" => SetSnapshotRef(n.get("ref-name").asText, MetaJson.refFromJson(n))
    case "remove-snapshots" =>
      RemoveSnapshots(n.get("snapshot-ids").elements.asScala.map(_.asLong).toSeq)
    case "remove-snapshot-ref" => RemoveSnapshotRef(n.get("ref-name").asText)
    case "set-location" => SetLocation(n.get("location").asText)
    case "set-properties" =>
      SetProperties(n.get("updates").properties.asScala
        .map(e => e.getKey -> e.getValue.asText).toMap)
    case "remove-properties" =>
      RemoveProperties(n.get("removals").elements.asScala.map(_.asText).toSeq)
    case "set-statistics" => SetStatistics(MetaJson.statisticsFromJson(n.get("statistics")))
    case "remove-statistics" => RemoveStatistics(n.get("snapshot-id").asLong)
    case "set-partition-statistics" =>
      val p = n.get("partition-statistics")
      SetPartitionStatistics(PartitionStatisticsFile(
        p.get("snapshot-id").asLong,
        p.get("statistics-path").asText,
        p.get("file-size-in-bytes").asLong))
    case "remove-partition-statistics" =>
      RemovePartitionStatistics(n.get("snapshot-id").asLong)
    case other => throw new IllegalArgumentException(s"unknown metadata update: $other")
  }

  // ---------- requirements ----------

  def requirementToJson(r: TableRequirement): ObjectNode = {
    val o = mapper.createObjectNode()
    r match {
      case AssertCreate => o.put("type", "assert-create")
      case AssertTableUuid(uuid) =>
        o.put("type", "assert-table-uuid"); o.put("uuid", uuid)
      case AssertRefSnapshotId(ref, id) =>
        o.put("type", "assert-ref-snapshot-id"); o.put("ref", ref)
        id match { case Some(v) => o.put("snapshot-id", v); case None => o.putNull("snapshot-id") }
      case AssertCurrentSchemaId(id) =>
        o.put("type", "assert-current-schema-id"); o.put("current-schema-id", id)
      case AssertDefaultSpecId(id) =>
        o.put("type", "assert-default-spec-id"); o.put("default-spec-id", id)
      case AssertDefaultSortOrderId(id) =>
        o.put("type", "assert-default-sort-order-id"); o.put("default-sort-order-id", id)
      case AssertLastAssignedFieldId(id) =>
        o.put("type", "assert-last-assigned-field-id"); o.put("last-assigned-field-id", id)
      case AssertLastAssignedPartitionId(id) =>
        o.put("type", "assert-last-assigned-partition-id"); o.put("last-assigned-partition-id", id)
    }
    o
  }

  def requirementFromJson(n: JsonNode): TableRequirement = n.get("type").asText match {
    case "assert-create" => AssertCreate
    case "assert-table-uuid" => AssertTableUuid(n.get("uuid").asText)
    case "assert-ref-snapshot-id" =>
      val id = Option(n.get("snapshot-id")).filterNot(_.isNull).map(_.asLong)
      AssertRefSnapshotId(n.get("ref").asText, id)
    case "assert-current-schema-id" => AssertCurrentSchemaId(n.get("current-schema-id").asInt)
    case "assert-default-spec-id" => AssertDefaultSpecId(n.get("default-spec-id").asInt)
    case "assert-default-sort-order-id" =>
      AssertDefaultSortOrderId(n.get("default-sort-order-id").asInt)
    case "assert-last-assigned-field-id" =>
      AssertLastAssignedFieldId(n.get("last-assigned-field-id").asInt)
    case "assert-last-assigned-partition-id" =>
      AssertLastAssignedPartitionId(n.get("last-assigned-partition-id").asInt)
    case other => throw new IllegalArgumentException(s"unknown requirement: $other")
  }

  // ---------- diff: base → target as a MetadataUpdate list ----------

  /** A neutral zero-state base for staged creates: the first commit of a
    * stage-created table diffs against this, so its update list rebuilds
    * the whole table (assign-uuid, add-schema, …) server-side — the REST
    * server holds NO staged state between requests. */
  val emptyBase: TableMetadata = TableMetadata(
    formatVersion = 1, tableUuid = "", location = "",
    lastSequenceNumber = 0L, lastUpdatedMs = 0L, lastColumnId = 0,
    schemas = IndexedSeq.empty, currentSchemaId = -1,
    partitionSpecs = IndexedSeq.empty, defaultSpecId = -1, lastPartitionId = -1,
    properties = Map.empty, currentSnapshotId = None,
    snapshots = IndexedSeq.empty, snapshotLog = IndexedSeq.empty,
    metadataLog = IndexedSeq.empty, sortOrders = IndexedSeq.empty,
    defaultSortOrderId = -1, refs = Map.empty)

  /** Express `target` as changes against `base`. The inverse of
    * `applyUpdates`: applyUpdates(base, diff(base, target)) equals
    * `target` on every durable field (timestamps the server stamps
    * itself — lastUpdatedMs — may differ; nothing else does). */
  def diff(base: TableMetadata, target: TableMetadata): Seq[MetadataUpdate] = {
    val ups = ArrayBuffer.empty[MetadataUpdate]
    if (base.tableUuid != target.tableUuid) ups += AssignUuid(target.tableUuid)
    if (base.formatVersion != target.formatVersion)
      ups += UpgradeFormatVersion(target.formatVersion)
    if (base.location != target.location) ups += SetLocation(target.location)

    target.schemas.filterNot(s => base.schemas.exists(_.schemaId == s.schemaId))
      .foreach(s => ups += AddSchema(s))
    if (base.currentSchemaId != target.currentSchemaId)
      ups += SetCurrentSchema(target.currentSchemaId)
    target.partitionSpecs.filterNot(s => base.partitionSpecs.exists(_.specId == s.specId))
      .foreach(s => ups += AddPartitionSpec(s))
    if (base.defaultSpecId != target.defaultSpecId)
      ups += SetDefaultSpec(target.defaultSpecId)
    target.sortOrders.filterNot(s => base.sortOrders.exists(_.orderId == s.orderId))
      .foreach(s => ups += AddSortOrder(s))
    if (base.defaultSortOrderId != target.defaultSortOrderId)
      ups += SetDefaultSortOrder(target.defaultSortOrderId)

    val baseSnapIds = base.snapshots.map(_.snapshotId).toSet
    val targetSnapIds = target.snapshots.map(_.snapshotId).toSet
    target.snapshots.filterNot(s => baseSnapIds(s.snapshotId))
      .sortBy(_.sequenceNumber).foreach(s => ups += AddSnapshot(s))
    val removed = base.snapshots.map(_.snapshotId).filterNot(targetSnapIds)
    if (removed.nonEmpty) ups += RemoveSnapshots(removed)

    target.refs.toSeq.sortBy(_._1).foreach { case (name, r) =>
      if (!base.refs.get(name).contains(r)) ups += SetSnapshotRef(name, r)
    }
    (base.refs.keySet -- target.refs.keySet).toSeq.sorted
      .foreach(name => ups += RemoveSnapshotRef(name))

    val propUpdates = target.properties.filter { case (k, v) =>
      !base.properties.get(k).contains(v) }
    if (propUpdates.nonEmpty) ups += SetProperties(propUpdates)
    val propRemovals = (base.properties.keySet -- target.properties.keySet).toSeq.sorted
    if (propRemovals.nonEmpty) ups += RemoveProperties(propRemovals)

    target.statistics.filterNot(base.statistics.contains)
      .foreach(sf => ups += SetStatistics(sf))
    val targetStatIds = target.statistics.map(_.snapshotId).toSet
    base.statistics.map(_.snapshotId).distinct.filterNot(targetStatIds)
      .foreach(id => ups += RemoveStatistics(id))

    target.partitionStatistics.filterNot(base.partitionStatistics.contains)
      .foreach(psf => ups += SetPartitionStatistics(psf))
    val targetPartStatIds = target.partitionStatistics.map(_.snapshotId).toSet
    base.partitionStatistics.map(_.snapshotId).distinct.filterNot(targetPartStatIds)
      .foreach(id => ups += RemovePartitionStatistics(id))

    ups.toSeq
  }

  // ---------- apply: server-side interpretation of an update list ----------

  /** Apply updates to the server's current base. Deterministic — derived
    * fields (lastColumnId, lastPartitionId, lastSequenceNumber, nextRowId,
    * snapshotLog, currentSnapshotId) are recomputed from the updates, so
    * the committed metadata is reproducible from (base, updates) alone. */
  def applyUpdates(base: TableMetadata, updates: Seq[MetadataUpdate],
      commitTimeMs: Long = System.currentTimeMillis()): TableMetadata = {
    var m = base
    var lastAddedSchema = -1
    var lastAddedSpec = -1
    var lastAddedOrder = -1
    // snapshots added by THIS update list: moving main to one of these is
    // a normal commit (log entry dated by the snapshot itself); moving
    // main to a pre-existing snapshot is a rollback/fast-forward, which
    // local catalogs date at commit time — the REST path must match or
    // TIMESTAMP AS OF resolves differently across catalogs
    val addedSnapIds = scala.collection.mutable.Set.empty[Long]
    updates.foreach {
      case AssignUuid(uuid) => m = m.copy(tableUuid = uuid)
      case UpgradeFormatVersion(v) =>
        require(TableMetadata.SupportedVersions.contains(v), s"unsupported format version $v")
        require(v >= m.formatVersion, s"cannot downgrade format version ${m.formatVersion} -> $v")
        m = m.copy(formatVersion = v)
      case AddSchema(s) =>
        require(!m.schemas.exists(_.schemaId == s.schemaId),
          s"schema ${s.schemaId} already exists")
        m = m.copy(schemas = m.schemas :+ s,
          lastColumnId = math.max(m.lastColumnId, s.highestFieldId))
        lastAddedSchema = s.schemaId
      case SetCurrentSchema(id) =>
        val target = if (id == -1) lastAddedSchema else id
        require(m.schemas.exists(_.schemaId == target), s"no schema $target")
        m = m.copy(currentSchemaId = target)
      case AddPartitionSpec(s) =>
        require(!m.partitionSpecs.exists(_.specId == s.specId),
          s"spec ${s.specId} already exists")
        val maxField = (s.fields.map(_.fieldId) :+ (PartitionSpec.PartitionDataIdStart - 1)).max
        m = m.copy(partitionSpecs = m.partitionSpecs :+ s,
          lastPartitionId = math.max(m.lastPartitionId, maxField))
        lastAddedSpec = s.specId
      case SetDefaultSpec(id) =>
        val target = if (id == -1) lastAddedSpec else id
        require(m.partitionSpecs.exists(_.specId == target), s"no spec $target")
        m = m.copy(defaultSpecId = target)
      case AddSortOrder(s) =>
        require(!m.sortOrders.exists(_.orderId == s.orderId),
          s"sort order ${s.orderId} already exists")
        m = m.copy(sortOrders = m.sortOrders :+ s)
        lastAddedOrder = s.orderId
      case SetDefaultSortOrder(id) =>
        val target = if (id == -1) lastAddedOrder else id
        require(m.sortOrders.exists(_.orderId == target), s"no sort order $target")
        m = m.copy(defaultSortOrderId = target)
      case AddSnapshot(s) =>
        require(!m.snapshots.exists(_.snapshotId == s.snapshotId),
          s"snapshot ${s.snapshotId} already exists")
        val nextRow = (m.nextRowId, s.firstRowId) match {
          case (cur, Some(first)) =>
            Some(math.max(cur.getOrElse(0L), first + s.addedRows.getOrElse(0L)))
          case (cur, None) => cur
        }
        addedSnapIds += s.snapshotId
        m = m.copy(snapshots = m.snapshots :+ s,
          lastSequenceNumber = math.max(m.lastSequenceNumber, s.sequenceNumber),
          lastUpdatedMs = math.max(m.lastUpdatedMs, s.timestampMs),
          nextRowId = nextRow)
      case SetSnapshotRef(name, r) =>
        val snap = m.snapshotById(r.snapshotId)
          .getOrElse(throw new IllegalArgumentException(
            s"ref $name -> unknown snapshot ${r.snapshotId}"))
        val moved = !m.refs.get(name).exists(_.snapshotId == r.snapshotId)
        val logTs =
          if (addedSnapIds(snap.snapshotId)) snap.timestampMs else commitTimeMs
        m = m.copy(refs = m.refs.updated(name, r),
          currentSnapshotId = if (name == "main") Some(r.snapshotId) else m.currentSnapshotId,
          snapshotLog =
            if (name == "main" && moved)
              m.snapshotLog :+ SnapshotLogEntry(logTs, snap.snapshotId)
            else m.snapshotLog)
      case RemoveSnapshots(ids) =>
        val drop = ids.toSet
        m = m.copy(snapshots = m.snapshots.filterNot(s => drop(s.snapshotId)),
          snapshotLog = m.snapshotLog.filterNot(e => drop(e.snapshotId)))
      case RemoveSnapshotRef(name) =>
        m = m.copy(refs = m.refs - name,
          currentSnapshotId = if (name == "main") None else m.currentSnapshotId)
      case SetLocation(loc) => m = m.copy(location = loc)
      case SetProperties(ups) =>
        // reserved keys (reserved_properties()) refuse over the wire too
        // — the REST server applies updates without IceTable's commit
        // validation, so this is its own enforcement point
        graft.ice.meta.TableProperties.validateUnreserved(ups.keys)
        graft.ice.meta.TableProperties.validateValues(ups)
        m = m.copy(properties = m.properties ++ ups)
      case RemoveProperties(ks) =>
        graft.ice.meta.TableProperties.validateUnreserved(ks)
        m = m.copy(properties = m.properties -- ks)
      case SetStatistics(sf) =>
        m = m.copy(statistics =
          m.statistics.filterNot(_.snapshotId == sf.snapshotId) :+ sf)
      case RemoveStatistics(id) =>
        m = m.copy(statistics = m.statistics.filterNot(_.snapshotId == id))
      case SetPartitionStatistics(psf) =>
        m = m.copy(partitionStatistics =
          m.partitionStatistics.filterNot(_.snapshotId == psf.snapshotId) :+ psf)
      case RemovePartitionStatistics(id) =>
        m = m.copy(partitionStatistics =
          m.partitionStatistics.filterNot(_.snapshotId == id))
    }
    m
  }

  // ---------- request/response bodies (types.h:37-121) ----------

  def metadataToNode(m: TableMetadata): JsonNode = mapper.readTree(MetaJson.toJson(m))
  def metadataFromNode(n: JsonNode): TableMetadata = MetaJson.fromJson(n.toString)

  /** LoadTableResult (types.h:76-85): metadata-location + metadata +
    * config. The catalog version travels in `config("graft.version")` —
    * the spec's client-config escape hatch — so the client can keep its
    * optimistic-commit version without parsing the location path. */
  def loadTableResult(metadataLocation: Option[String], m: TableMetadata,
      version: Int): String = {
    val o = mapper.createObjectNode()
    metadataLocation.foreach(o.put("metadata-location", _))
    o.set[ObjectNode]("metadata", metadataToNode(m).asInstanceOf[ObjectNode])
    o.putObject("config").put("graft.version", version.toString)
    o.toString
  }

  def namespaceArray(levels: Seq[Seq[String]], field: String): String = {
    val o = mapper.createObjectNode()
    val arr = o.putArray(field)
    levels.foreach { ns => val a = arr.addArray(); ns.foreach(a.add) }
    o.toString
  }

  def identifierToJson(ident: TableIdentifier): ObjectNode = {
    val o = mapper.createObjectNode()
    val a = o.putArray("namespace"); ident.namespace.foreach(a.add)
    o.put("name", ident.name)
    o
  }

  def identifierFromJson(n: JsonNode): TableIdentifier =
    TableIdentifier(n.get("namespace").elements.asScala.map(_.asText).toSeq,
      n.get("name").asText)

  def propertiesToNode(o: ObjectNode, field: String, props: Map[String, String]): Unit = {
    val p = o.putObject(field)
    props.toSeq.sortBy(_._1).foreach { case (k, v) => p.put(k, v) }
  }

  def propertiesFromNode(n: JsonNode, field: String): Map[String, String] =
    Option(n.get(field)).map(_.properties.asScala
      .map(e => e.getKey -> e.getValue.asText).toMap).getOrElse(Map.empty)

  def stringSeq(n: JsonNode, field: String): Seq[String] =
    Option(n.get(field)).map(_.elements.asScala.map(_.asText).toSeq).getOrElse(Nil)

  /** ErrorResponse: {"error": {"message","type","code"}}. */
  def errorBody(message: String, errType: String, code: Int): String = {
    val o = mapper.createObjectNode()
    val e = o.putObject("error")
    e.put("message", message); e.put("type", errType); e.put("code", code)
    o.toString
  }

  def parse(s: String): JsonNode = mapper.readTree(s)
  def newObject(): ObjectNode = mapper.createObjectNode()

  // ---------- scan-planning expression serde ----------
  // The public REST spec's PlanTableScan carries the filter as the
  // Iceberg expression JSON (ExpressionParser shapes): unary
  // {"type","term"}, literal {"type","term","value"}, set
  // {"type","term","values"}, logical {"type","left","right"}/{"child"}.
  // Terms travel as plain column-name references; transform terms and
  // engine-opaque RawE predicates refuse loudly — a thin client cannot
  // know how the server would interpret them.

  import graft.ice.expr.{AndE, Expr, FalseE, NotE, Op, OrE, Predicate, RawE, Term, TrueE}
  import graft.ice.transform.IdentityTransform
  import graft.ice.types.{Literal => IceLiteral}

  private val opNames: Map[Op, String] = Map(
    Op.IsNull -> "is-null", Op.NotNull -> "not-null",
    Op.IsNan -> "is-nan", Op.NotNan -> "not-nan",
    Op.Lt -> "lt", Op.LtEq -> "lt-eq", Op.Gt -> "gt", Op.GtEq -> "gt-eq",
    Op.Eq -> "eq", Op.NotEq -> "not-eq",
    Op.In -> "in", Op.NotIn -> "not-in",
    Op.StartsWith -> "starts-with", Op.NotStartsWith -> "not-starts-with")
  private val opByName: Map[String, Op] = opNames.map(_.swap)

  private def literalScalar(o: ObjectNode, field: String, l: IceLiteral): Unit = {
    import graft.ice.types._
    l.tpe match {
      // temporal literals travel as ISO strings (the ExpressionParser
      // wire shape): a date's raw Integer would serialize as a plain
      // number, deserialize as a LongT literal, and fail to bind against
      // a date column server-side (no LongT->DateT cast) — the string
      // form binds through the existing StringT->DateT/Timestamp casts
      case DateT =>
        o.put(field,
          java.time.LocalDate.ofEpochDay(l.raw.asInstanceOf[Int].toLong).toString)
      case TimestampT | TimestampTzT =>
        val us = l.raw.asInstanceOf[Long]
        o.put(field, java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(us, 1000000L),
          (Math.floorMod(us, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC).toString)
      case TimeT => throw new IllegalArgumentException(
        // refuse loudly like decimal/uuid/binary: the server has no
        // StringT->TimeT bind cast, so a silently-sent value would 500
        "cannot serialize time literal over the plan wire")
      case _ => l.raw match {
        case b: java.lang.Boolean => o.put(field, b.booleanValue)
        case i: java.lang.Integer => o.put(field, i.longValue)
        case n: java.lang.Long => o.put(field, n.longValue)
        case f: java.lang.Float => o.put(field, f.doubleValue)
        case d: java.lang.Double => o.put(field, d.doubleValue)
        case s: String => o.put(field, s)
        case other => throw new IllegalArgumentException(
          s"cannot serialize ${l.tpe} literal over the plan wire: $other")
      }
    }
  }

  private def literalFromScalar(n: JsonNode): IceLiteral =
    if (n.isBoolean) IceLiteral.bool(n.asBoolean)
    else if (n.isIntegralNumber) IceLiteral.long(n.asLong)
    else if (n.isNumber) IceLiteral.double(n.asDouble)
    else if (n.isTextual) IceLiteral.string(n.asText)
    else throw new IllegalArgumentException(s"unsupported literal JSON: $n")

  def exprToJson(e: Expr): ObjectNode = {
    val o = newObject()
    e match {
      case TrueE => o.put("type", "true")
      case FalseE => o.put("type", "false")
      case AndE(l, r) =>
        o.put("type", "and")
        o.set[ObjectNode]("left", exprToJson(l))
        o.set[ObjectNode]("right", exprToJson(r))
      case OrE(l, r) =>
        o.put("type", "or")
        o.set[ObjectNode]("left", exprToJson(l))
        o.set[ObjectNode]("right", exprToJson(r))
      case NotE(c) =>
        o.put("type", "not")
        o.set[ObjectNode]("child", exprToJson(c))
      case Predicate(op, Term(name, IdentityTransform), lits) =>
        o.put("type", opNames(op))
        o.put("term", name)
        op match {
          case Op.In | Op.NotIn =>
            val a = o.putArray("values")
            lits.foreach { l =>
              val tmp = newObject(); literalScalar(tmp, "v", l); a.add(tmp.get("v"))
            }
          case Op.IsNull | Op.NotNull | Op.IsNan | Op.NotNan => ()
          case _ => literalScalar(o, "value", lits.head)
        }
      case Predicate(_, t, _) => throw new IllegalArgumentException(
        s"transform terms are not supported over the plan wire: $t")
      case RawE(sql) => throw new IllegalArgumentException(
        s"engine-opaque predicates cannot travel over the plan wire: $sql")
    }
    o
  }

  def exprFromJson(n: JsonNode): Expr = n.get("type").asText match {
    case "true" => TrueE
    case "false" => FalseE
    case "and" => Expr.and(exprFromJson(n.get("left")), exprFromJson(n.get("right")))
    case "or" => Expr.or(exprFromJson(n.get("left")), exprFromJson(n.get("right")))
    case "not" => Expr.not(exprFromJson(n.get("child")))
    case opName =>
      val op = opByName.getOrElse(opName,
        throw new IllegalArgumentException(s"unknown predicate type '$opName'"))
      val term = Term(n.get("term").asText)
      val lits = op match {
        case Op.In | Op.NotIn =>
          n.get("values").elements.asScala.map(literalFromScalar).toSeq
        case Op.IsNull | Op.NotNull | Op.IsNan | Op.NotNan => Nil
        case _ => Seq(literalFromScalar(n.get("value")))
      }
      Predicate(op, term, lits)
  }

  // ---------- scan-planning task serde ----------

  /** A server-planned scan task, the thin-client view of FileScanTask:
    * enough to read the file without ever opening table metadata.
    * `deleteRefs` are indexes into the plan's TOP-LEVEL delete-files
    * array (the public spec's delete-file-references shape) — the
    * data-file<->delete-file linkage a MoR-correct thin read needs;
    * sequence-number visibility is resolved SERVER-side per task. */
  final case class PlannedTask(path: String, format: String,
      recordCount: Long, fileSizeInBytes: Long, deleteRefs: Seq[Int] = Nil)

  /** A planned delete file: parquet position/equality deletes carry just
    * the path; deletion vectors add (content-offset, content-size) into
    * their puffin container and the referenced data file. */
  final case class PlannedDelete(path: String, content: String,
      contentOffset: Option[Long] = None,
      contentSizeInBytes: Option[Long] = None,
      equalityIds: Seq[Int] = Nil,
      referencedDataFile: Option[String] = None)

  final case class PlanResult(tasks: Seq[PlannedTask],
      deleteFiles: Seq[PlannedDelete], snapshotId: Long)

  /** One wire page of a plan response: the tasks slice plus the paging
    * handles (types.h:37-121 declares the paged protocol; a million-file
    * plan must never be one JSON allocation on either side). `status` is
    * "completed" (result present), "submitted" (async handshake — poll
    * the plan-id), or "failed" (error carries the server message). */
  final case class PlanPage(result: PlanResult,
      planId: Option[String], nextPageToken: Option[String],
      status: String = "completed", error: Option[String] = None)

  def planResultToJson(r: PlanResult, planId: Option[String] = None,
      nextPageToken: Option[String] = None): ObjectNode = {
    val o = newObject()
    // in-process planning completes synchronously ("completed"); large
    // plans paginate via plan-id + next-page-token instead of the async
    // submitted/plan-id handshake (the server holds the finished plan)
    o.put("plan-status", "completed")
    o.put("snapshot-id", r.snapshotId)
    planId.foreach(o.put("plan-id", _))
    nextPageToken.foreach(o.put("next-page-token", _))
    val ts = o.putArray("file-scan-tasks")
    r.tasks.foreach { t =>
      val to = ts.addObject()
      val df = to.putObject("data-file")
      df.put("file-path", t.path)
      df.put("file-format", t.format)
      df.put("record-count", t.recordCount)
      df.put("file-size-in-bytes", t.fileSizeInBytes)
      if (t.deleteRefs.nonEmpty) {
        val refs = to.putArray("delete-file-references")
        t.deleteRefs.foreach(refs.add)
      }
    }
    val ds = o.putArray("delete-files")
    r.deleteFiles.foreach { d =>
      val o2 = ds.addObject()
      o2.put("file-path", d.path)
      o2.put("content", d.content)
      d.contentOffset.foreach(o2.put("content-offset", _))
      d.contentSizeInBytes.foreach(o2.put("content-size-in-bytes", _))
      if (d.equalityIds.nonEmpty) {
        val a = o2.putArray("equality-ids"); d.equalityIds.foreach(a.add)
      }
      d.referencedDataFile.foreach(o2.put("referenced-data-file", _))
    }
    o
  }

  def planResultFromJson(n: JsonNode): PlanResult = planPageFromJson(n).result

  /** JSON body of the async "submitted" handshake (the reference's
    * types.h PlanStatus surface): no tasks yet, just the plan-id to
    * poll. */
  def planSubmittedJson(planId: String): ObjectNode = {
    val o = newObject()
    o.put("plan-status", "submitted")
    o.put("plan-id", planId)
    o
  }

  def planFailedJson(planId: String, message: String): ObjectNode = {
    val o = newObject()
    o.put("plan-status", "failed")
    o.put("plan-id", planId)
    o.putObject("error").put("message", message)
    o
  }

  def planPageFromJson(n: JsonNode): PlanPage = {
    val status = Option(n.get("plan-status")).map(_.asText).getOrElse("completed")
    if (status != "completed")
      return PlanPage(PlanResult(Nil, Nil, -1L),
        Option(n.get("plan-id")).map(_.asText), None, status,
        Option(n.get("error")).flatMap(e => Option(e.get("message")))
          .map(_.asText))
    val tasks = Option(n.get("file-scan-tasks")).map(_.elements.asScala.map { t =>
      val df = t.get("data-file")
      PlannedTask(df.get("file-path").asText, df.get("file-format").asText,
        df.get("record-count").asLong, df.get("file-size-in-bytes").asLong,
        Option(t.get("delete-file-references")).map(
          _.elements.asScala.map(_.asInt).toSeq).getOrElse(Nil))
    }.toSeq).getOrElse(Nil)
    val dels = Option(n.get("delete-files")).map(_.elements.asScala.map { d =>
      PlannedDelete(d.get("file-path").asText,
        Option(d.get("content")).map(_.asText).getOrElse("position-deletes"),
        Option(d.get("content-offset")).map(_.asLong),
        Option(d.get("content-size-in-bytes")).map(_.asLong),
        Option(d.get("equality-ids")).map(
          _.elements.asScala.map(_.asInt).toSeq).getOrElse(Nil),
        Option(d.get("referenced-data-file")).map(_.asText))
    }.toSeq).getOrElse(Nil)
    PlanPage(PlanResult(tasks, dels, n.get("snapshot-id").asLong),
      Option(n.get("plan-id")).map(_.asText),
      Option(n.get("next-page-token")).map(_.asText))
  }
}
