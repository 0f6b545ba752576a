package graft.ice.catalog

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode

import graft.ice.meta._
import graft.ice.types.Schema
import RestJson._

/** Iceberg REST catalog client (C3; reference: rest_catalog.h:28-39 —
  * which implements only GetConfig + ListNamespaces over cpr). This
  * client implements the FULL [[Catalog]] interface over the public REST
  * protocol, so every table-layer operation (scans, appends, deletes,
  * streaming ingest, maintenance) runs unchanged against a remote
  * catalog: `IceTable` never knows its commits travel over HTTP.
  *
  * Commits are change-based: the client diffs its base metadata against
  * the updated metadata (RestJson.diff) and POSTs requirements + updates;
  * the server applies them to ITS current base. Because requirements —
  * not a version CAS — arbitrate conflicts, two writers touching
  * different refs can both commit without a retry, which a plain
  * version-CAS catalog would serialize. A 409 from the server surfaces as
  * CommitFailedException, feeding IceTable's optimistic retry loop.
  *
  * Scale note: the client holds one cached (version, metadata) pair per
  * table — metadata-sized, never data-sized — and every call is a single
  * round-trip except list paging. Safe to construct per-executor, but
  * intended for the driver: plan state flows through broadcast, not
  * through catalog calls.
  */
final class RestCatalog(baseUrl: String, token: Option[String] = None)
  extends Catalog {

  private val http = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10)).build()
  /** Last server metadata seen per table: the diff base for commits. */
  private val cache = new ConcurrentHashMap[TableIdentifier, (Int, TableMetadata)]()

  /** GET /v1/config on first use (rest_catalog.cc:33-37); merged
    * defaults < overrides, kept for client configuration. */
  lazy val config: Map[String, String] = {
    val n = parse(send(get(s"$baseUrl/v1/config"), ok = Set(200)))
    propertiesFromNode(n, "defaults") ++ propertiesFromNode(n, "overrides")
  }

  // ---------- namespaces ----------

  override def listNamespaces(parent: Seq[String]): Seq[Seq[String]] = {
    val base = s"$baseUrl/v1/namespaces" +
      (if (parent.nonEmpty) s"?parent=${nsSeg(parent)}" else "")
    paged(base, "namespaces")(_.elements.asScala.map(e =>
      e.elements.asScala.map(_.asText).toSeq).toSeq)
  }

  override def createNamespace(namespace: Seq[String],
      properties: Map[String, String]): Unit = {
    val o = newObject()
    val a = o.putArray("namespace"); namespace.foreach(a.add)
    propertiesToNode(o, "properties", properties)
    send(post(s"$baseUrl/v1/namespaces", o.toString), ok = Set(200))
  }

  override def namespaceExists(namespace: Seq[String]): Boolean =
    head(s"$baseUrl/v1/namespaces/${nsSeg(namespace)}")

  override def dropNamespace(namespace: Seq[String]): Boolean =
    try { send(delete(s"$baseUrl/v1/namespaces/${nsSeg(namespace)}"), ok = Set(204)); true }
    catch { case _: NoSuchNamespaceException => false }

  override def loadNamespaceProperties(namespace: Seq[String]): Map[String, String] = {
    val n = parse(send(get(s"$baseUrl/v1/namespaces/${nsSeg(namespace)}"), ok = Set(200)))
    propertiesFromNode(n, "properties")
  }

  override def updateNamespaceProperties(namespace: Seq[String],
      updates: Map[String, String], removals: Set[String]): Unit = {
    val o = newObject()
    val rm = o.putArray("removals"); removals.toSeq.sorted.foreach(rm.add)
    propertiesToNode(o, "updates", updates)
    send(post(s"$baseUrl/v1/namespaces/${nsSeg(namespace)}/properties", o.toString),
      ok = Set(200))
  }

  // ---------- tables ----------

  override def listTables(namespace: Seq[String]): Seq[TableIdentifier] =
    paged(s"$baseUrl/v1/namespaces/${nsSeg(namespace)}/tables", "identifiers")(
      _.elements.asScala.map(identifierFromJson).toSeq)

  override def tableExists(ident: TableIdentifier): Boolean =
    head(tableUrl(ident))

  override def loadTable(ident: TableIdentifier): TableRef = {
    val (v, m) = parseLoadResult(send(get(tableUrl(ident)), ok = Set(200)))
    cache.put(ident, (v, m))
    TableRef(ident, m, v, this)
  }

  /** Server-side scan planning (PlanTableScan): POST the filter, get
    * back the manifest-pruned file list — a THIN client scans without
    * reading a byte of table metadata; the server's planner (partition
    * summaries, file metrics, transform projections) does the pruning.
    * Residual row filtering stays with the caller: the returned files
    * are a superset of matching rows, exactly like local planFiles.
    *
    * `pageSize` bounds each wire response: the server parks the finished
    * plan under a plan-id and this client walks the pages, so a
    * million-file plan is never one JSON body on either side. The
    * returned PlanResult is always COMPLETE regardless of paging.
    *
    * Callers reading `tasks` raw MUST check `deleteFiles` first: tasks
    * carry no data-file<->delete-file linkage, so reading planned files
    * of a table with MoR deletes without applying them resurrects
    * deleted rows. */
  def planScan(ident: TableIdentifier,
      filter: Option[graft.ice.expr.Expr] = None,
      snapshotId: Option[Long] = None,
      caseSensitive: Boolean = true,
      pageSize: Option[Int] = None): PlanResult = {
    val o = newObject()
    snapshotId.foreach(o.put("snapshot-id", _))
    o.put("case-sensitive", caseSensitive)
    pageSize.foreach(o.put("page-size", _))
    filter.foreach(f => o.set[JsonNode]("filter", exprToJson(f)))
    var first = planPageFromJson(parse(send(
      post(s"${tableUrl(ident)}/plan", o.toString), ok = Set(200))))
    // async handshake: the server answered "submitted" + plan-id without
    // holding the request open — poll the plan-id until it completes.
    // Deadline-bounded so a dead server-side planner cannot hang the
    // client forever; "failed" carries the server's planning error.
    if (first.status == "submitted") {
      val pid = first.planId.getOrElse(throw new IllegalStateException(
        "plan-status submitted without plan-id"))
      val sizeQ = pageSize.map(s => s"?pageSize=$s").getOrElse("")
      val deadline = System.currentTimeMillis() + planPollTimeoutMs
      var backoffMs = 10L
      while (first.status == "submitted") {
        if (System.currentTimeMillis() > deadline)
          throw new IllegalStateException(
            s"plan $pid still submitted after ${planPollTimeoutMs} ms")
        Thread.sleep(backoffMs)
        backoffMs = math.min(backoffMs * 2, 500L)
        first = planPageFromJson(parse(send(
          get(s"${tableUrl(ident)}/plan/$pid$sizeQ"), ok = Set(200))))
      }
    }
    if (first.status == "failed")
      throw new IllegalStateException(
        s"server-side planning failed: ${first.error.getOrElse("(no message)")}")
    var tasks = first.result.tasks
    var tok = first.nextPageToken
    while (tok.isDefined) {
      val pid = first.planId.getOrElse(throw new IllegalStateException(
        "server sent next-page-token without plan-id"))
      val sizeQ = pageSize.map(s => s"&pageSize=$s").getOrElse("")
      val page = planPageFromJson(parse(send(
        get(s"${tableUrl(ident)}/plan/$pid?pageToken=${enc(tok.get)}$sizeQ"),
        ok = Set(200))))
      tasks ++= page.result.tasks
      tok = page.nextPageToken
    }
    first.result.copy(tasks = tasks)
  }

  /** Cancel/release a parked server-side plan (idempotent). */
  def cancelPlan(ident: TableIdentifier, planId: String): Unit = {
    send(delete(s"${tableUrl(ident)}/plan/$planId"), ok = Set(204)); ()
  }

  private val planPollTimeoutMs: Long = 10L * 60 * 1000

  override def dropTable(ident: TableIdentifier, purge: Boolean): Boolean = {
    val url = tableUrl(ident) + (if (purge) "?purgeRequested=true" else "")
    try { send(delete(url), ok = Set(204)); cache.remove(ident); true }
    catch { case _: NoSuchTableException => false }
  }

  override def createTable(ident: TableIdentifier, schema: Schema,
      spec: PartitionSpec, sortOrder: SortOrder,
      properties: Map[String, String], location: Option[String]): TableRef =
    createImpl(ident, schema, spec, sortOrder, properties, location, staged = false)

  override def stageCreateTable(ident: TableIdentifier, schema: Schema,
      spec: PartitionSpec, sortOrder: SortOrder,
      properties: Map[String, String], location: Option[String]): TableRef =
    createImpl(ident, schema, spec, sortOrder, properties, location, staged = true)

  private def createImpl(ident: TableIdentifier, schema: Schema,
      spec: PartitionSpec, sortOrder: SortOrder, properties: Map[String, String],
      location: Option[String], staged: Boolean): TableRef = {
    val o = newObject()
    o.put("name", ident.name)
    location.foreach(o.put("location", _))
    o.set[JsonNode]("schema", MetaJson.schemaToJson(schema))
    if (spec.fields.nonEmpty) o.set[JsonNode]("partition-spec", MetaJson.specToJson(spec))
    if (sortOrder.fields.nonEmpty)
      o.set[JsonNode]("write-order", MetaJson.sortOrderToJson(sortOrder))
    if (staged) o.put("stage-create", true)
    propertiesToNode(o, "properties", properties)
    val body = send(
      post(s"$baseUrl/v1/namespaces/${nsSeg(ident.namespace)}/tables", o.toString),
      ok = Set(200))
    val (v, m) = parseLoadResult(body)
    if (!staged) cache.put(ident, (v, m))
    TableRef(ident, m, v, this)
  }

  override def registerTable(ident: TableIdentifier, metadataLocation: String): TableRef = {
    val o = newObject()
    o.put("name", ident.name)
    o.put("metadata-location", metadataLocation)
    val body = send(
      post(s"$baseUrl/v1/namespaces/${nsSeg(ident.namespace)}/register", o.toString),
      ok = Set(200))
    val (v, m) = parseLoadResult(body)
    cache.put(ident, (v, m))
    TableRef(ident, m, v, this)
  }

  override def renameTable(source: TableIdentifier,
      destination: TableIdentifier): Unit = {
    val o = newObject()
    o.set[JsonNode]("source", identifierToJson(source))
    o.set[JsonNode]("destination", identifierToJson(destination))
    send(post(s"$baseUrl/v1/tables/rename", o.toString), ok = Set(200, 204))
    cache.remove(source); ()
  }

  override def currentVersion(ident: TableIdentifier): Int =
    try loadTable(ident).version catch { case _: NoSuchTableException => 0 }

  /** Status-check probe over REST: snapshot ids are generated CLIENT-side,
    * so "every snapshot id the attempt NEWLY minted (attempted minus the
    * pre-attempt base) exists in the current table" proves the attempt
    * landed (a concurrent writer cannot have minted them). A current
    * version below the attempted one proves it did not land. Everything
    * else — snapshot-free (property/schema-only) attempts, snapshot-
    * REMOVING attempts (expiry), and newly-minted ids absent at a
    * version at/past the attempted one (another writer may have raced,
    * or a landed snapshot may since have been expired) — is genuinely
    * indistinguishable over this protocol: None, caller keeps polling
    * then surfaces unknown. Adopting on a base-id subset test was the
    * phantom-commit bug: base ids are trivially present, so a property
    * commit that provably failed would be adopted, diverging meta from
    * the server and (after a falsely-adopted expiry) letting
    * removeOrphanFiles delete files the server still references. */
  override def commitLanded(ident: TableIdentifier, attemptedVersion: Int,
      attempted: TableMetadata, base: TableMetadata): Option[Boolean] = {
    cache.remove(ident)
    val cur = try loadTable(ident)
      catch { case _: NoSuchTableException => return Some(false) }
    if (cur.version < attemptedVersion) return Some(false)
    val newIds = attempted.snapshots.map(_.snapshotId).toSet --
      base.snapshots.map(_.snapshotId).toSet
    val curIds = cur.metadata.snapshots.map(_.snapshotId).toSet
    if (newIds.nonEmpty && newIds.subsetOf(curIds)) Some(true)
    else None
  }

  override def metadataLocation(ident: TableIdentifier): Option[String] = {
    val n = parse(send(get(tableUrl(ident)), ok = Set(200)))
    Option(n.get("metadata-location")).map(_.asText)
  }

  // ---------- commit ----------

  override def commit(ident: TableIdentifier, baseVersion: Int,
      updated: TableMetadata): Int = {
    val (base, requirements) =
      if (baseVersion == 0) {
        // first commit of a staged create: rebuild from zero, guarded by
        // assert-create — the server holds no staged state
        (emptyBase, Seq(AssertCreate: TableRequirement))
      } else {
        val b = Option(cache.get(ident)).filter(_._1 == baseVersion).map(_._2)
          .getOrElse {
            val loaded = loadTable(ident)
            if (loaded.version != baseVersion)
              throw new CommitFailedException(
                s"$ident: base version $baseVersion is stale (current ${loaded.version})")
            loaded.metadata
          }
        // uuid always; plus one ref assert per ref this commit moves —
        // the server rejects if a concurrent writer moved the same ref
        val refAsserts = updated.refs.toSeq.sortBy(_._1).collect {
          case (name, r) if !b.refs.get(name).contains(r) =>
            AssertRefSnapshotId(name, b.refs.get(name).map(_.snapshotId)): TableRequirement
        }
        val removedRefAsserts = (b.refs.keySet -- updated.refs.keySet).toSeq.sorted.map {
          name => AssertRefSnapshotId(name, b.refs.get(name).map(_.snapshotId)): TableRequirement
        }
        (b, (AssertTableUuid(b.tableUuid): TableRequirement) +: (refAsserts ++ removedRefAsserts))
      }
    val updates = diff(base, updated)
    val o = newObject()
    o.set[JsonNode]("identifier", identifierToJson(ident))
    val reqArr = o.putArray("requirements")
    requirements.foreach(r => reqArr.add(requirementToJson(r)))
    val upArr = o.putArray("updates")
    updates.foreach(u => upArr.add(updateToJson(u)))
    // a transport failure on the COMMIT call is an unknown outcome (the
    // server may have applied it before the response was lost) — surfaced
    // as such so IceTable reconciles via commit.status-check polling
    // instead of blind-retrying into a duplicate snapshot
    val body =
      try send(post(tableUrl(ident), o.toString), ok = Set(200))
      catch {
        case io: java.io.IOException =>
          cache.remove(ident)
          throw new CommitStateUnknownException(
            s"$ident: REST commit outcome unknown: ${io.getMessage}",
            baseVersion + 1, io)
      }
    val (v, serverMeta) = parseLoadResult(body)
    cache.put(ident, (v, serverMeta))
    v
  }

  // ---------- wire helpers ----------

  private def tableUrl(ident: TableIdentifier): String =
    s"$baseUrl/v1/namespaces/${nsSeg(ident.namespace)}/tables/${enc(ident.name)}"

  /** Namespace URL segment: percent-encoded levels joined by %1F. */
  private def nsSeg(ns: Seq[String]): String = ns.map(enc).mkString("%1F")

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, UTF_8).replace("+", "%20")

  private def parseLoadResult(body: String): (Int, TableMetadata) = {
    val n = parse(body)
    val m = metadataFromNode(n.get("metadata"))
    val v = propertiesFromNode(n, "config").get("graft.version").flatMap(_.toIntOption)
      .orElse(Option(n.get("metadata-location")).map(_.asText)
        .flatMap(loc => "v(\\d+)\\.metadata\\.json$".r.findFirstMatchIn(loc).map(_.group(1).toInt)))
      .getOrElse(1)
    (v, m)
  }

  private def paged[T](url: String, field: String)(parseRows: JsonNode => Seq[T]): Seq[T] = {
    val sep = if (url.contains("?")) "&" else "?"
    val out = Seq.newBuilder[T]
    var tok: Option[String] = Some("")
    while (tok.isDefined) {
      val u = url + (if (tok.get.isEmpty) "" else s"${sep}pageToken=${enc(tok.get)}")
      val n = parse(send(get(u), ok = Set(200)))
      out ++= parseRows(n.get(field))
      tok = Option(n.get("next-page-token")).map(_.asText)
    }
    out.result()
  }

  private def get(url: String) = base(url).GET().build()
  private def delete(url: String) = base(url).DELETE().build()
  private def post(url: String, body: String) =
    base(url).header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8)).build()

  private def base(url: String): HttpRequest.Builder = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .timeout(java.time.Duration.ofSeconds(60))
    token.foreach(t => b.header("Authorization", s"Bearer $t"))
    b
  }

  private def head(url: String): Boolean = {
    val req = base(url).method("HEAD", HttpRequest.BodyPublishers.noBody()).build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    resp.statusCode match {
      case 200 | 204 => true
      case 404 => false
      case code => throw raise(code, resp.body)
    }
  }

  private def send(req: HttpRequest, ok: Set[Int]): String = {
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (ok.contains(resp.statusCode)) resp.body
    else throw raise(resp.statusCode, resp.body)
  }

  /** Map the spec error model back to the catalog exception hierarchy. */
  private def raise(code: Int, body: String): RuntimeException = {
    val (errType, msg) =
      try {
        val e = parse(body).get("error")
        (e.get("type").asText, e.get("message").asText)
      } catch { case _: Throwable => ("", s"HTTP $code: $body") }
    errType match {
      case "NoSuchTableException" => new NoSuchTableException(msg)
      case "NoSuchNamespaceException" => new NoSuchNamespaceException(msg)
      case "AlreadyExistsException" => new AlreadyExistsException(msg)
      case "CommitFailedException" => new CommitFailedException(msg)
      case "UnsupportedOperationException" => new UnsupportedOperationException(msg)
      case _ => new RuntimeException(s"REST catalog error $code ($errType): $msg")
    }
  }
}
