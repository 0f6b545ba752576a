package graft.ice.catalog

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.ice.meta._
import RestJson._

/** In-process Iceberg REST catalog server: exposes any backing [[Catalog]]
  * over the public REST protocol on localhost (C3). The reference tests
  * its client the same way — an in-process httplib server bound to
  * 127.0.0.1 (rest_catalog_test.cc:36-44); this is the zero-egress
  * equivalent, built on the JDK's HttpServer, and additionally implements
  * the full route surface the reference only declares types for
  * (types.h:37-121).
  *
  * Commit endpoint semantics: load current base → check requirements →
  * apply updates → CAS-commit against the backing catalog. A lost CAS race
  * or a failed requirement both surface as 409 CommitFailedException; the
  * client's optimistic retry loop (IceTable.commit) refreshes and rebuilds.
  * The server holds no per-table state of its own — staged creates arrive
  * as assert-create commits whose update list rebuilds the table from
  * zero, so any number of server instances can front one warehouse.
  */
final class RestCatalogServer(backing: Catalog, bindPort: Int = 0,
    token: Option[String] = None,
    asyncPlanThresholdFiles: Long = Long.MaxValue) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", bindPort), 0)
  // small fixed pool: catalog calls are metadata-sized; concurrency matters
  // only for the commit-race tests and multi-client coordination
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
  // planner pool is SEPARATE from the HTTP pool: an async plan must never
  // occupy a request thread — that is the whole point of the handshake
  private val planPool = java.util.concurrent.Executors.newFixedThreadPool(2)
  server.setExecutor(pool)
  server.createContext("/v1", (ex: HttpExchange) => handle(ex))
  server.start()

  val port: Int = server.getAddress.getPort
  val baseUrl: String = s"http://127.0.0.1:$port"

  def stop(): Unit = {
    server.stop(0); pool.shutdownNow(); planPool.shutdownNow()
  }

  // ---------- routing ----------

  import RestCatalogServer.HttpError

  private def handle(ex: HttpExchange): Unit = {
    try {
      token.foreach { expected =>
        val got = Option(ex.getRequestHeaders.getFirst("Authorization"))
        if (!got.contains(s"Bearer $expected"))
          throw HttpError(401, "NotAuthorizedException", "missing or invalid bearer token")
      }
      val method = ex.getRequestMethod
      // getPath percent-decodes, turning an encoded %1F into the unit
      // separator; names never contain '/', so splitting on it is safe
      val path = ex.getRequestURI.getPath.stripPrefix("/v1").stripPrefix("/")
      val segs = if (path.isEmpty) Array.empty[String] else path.split("/")
      val query = parseQuery(Option(ex.getRequestURI.getRawQuery))
      route(ex, method, segs, query)
    } catch {
      case HttpError(code, t, msg) => reply(ex, code, errorBody(msg, t, code))
      case e: NoSuchTableException =>
        reply(ex, 404, errorBody(e.getMessage, "NoSuchTableException", 404))
      case e: NoSuchNamespaceException =>
        reply(ex, 404, errorBody(e.getMessage, "NoSuchNamespaceException", 404))
      case e: AlreadyExistsException =>
        reply(ex, 409, errorBody(e.getMessage, "AlreadyExistsException", 409))
      case e: CommitFailedException => // includes RequirementFailedException
        reply(ex, 409, errorBody(e.getMessage, "CommitFailedException", 409))
      case e: IllegalStateException =>
        reply(ex, 409, errorBody(e.getMessage, "IllegalStateException", 409))
      case e: Throwable =>
        reply(ex, 500, errorBody(String.valueOf(e.getMessage), e.getClass.getSimpleName, 500))
    } finally ex.close()
  }

  private def route(ex: HttpExchange, method: String, segs: Array[String],
      query: Map[String, String]): Unit = (method, segs.toList) match {
    case ("GET", List("config")) =>
      val o = newObject()
      o.putObject("defaults")
      o.putObject("overrides")
      reply(ex, 200, o.toString)

    case ("GET", List("namespaces")) =>
      val parent = query.get("parent").map(splitNs).getOrElse(Nil)
      val all = backing.listNamespaces(parent)
      val (pageRows, nextTok) = page(all, query)
      val body = parse(namespaceArray(pageRows, "namespaces")).asInstanceOf[
        com.fasterxml.jackson.databind.node.ObjectNode]
      nextTok.foreach(body.put("next-page-token", _))
      reply(ex, 200, body.toString)

    case ("POST", List("namespaces")) =>
      val req = readJson(ex)
      val ns = stringSeq(req, "namespace")
      val props = propertiesFromNode(req, "properties")
      backing.createNamespace(ns, props)
      val o = newObject()
      val a = o.putArray("namespace"); ns.foreach(a.add)
      propertiesToNode(o, "properties", props)
      reply(ex, 200, o.toString)

    case (m, List("namespaces", nsSeg)) =>
      val ns = splitNs(nsSeg)
      m match {
        case "GET" =>
          val props = backing.loadNamespaceProperties(ns)
          val o = newObject()
          val a = o.putArray("namespace"); ns.foreach(a.add)
          propertiesToNode(o, "properties", props)
          reply(ex, 200, o.toString)
        case "HEAD" =>
          reply(ex, if (backing.namespaceExists(ns)) 204 else 404, "")
        case "DELETE" =>
          if (backing.dropNamespace(ns)) reply(ex, 204, "")
          else throw new NoSuchNamespaceException(s"no such namespace: ${ns.mkString(".")}")
        case _ => throw HttpError(405, "UnsupportedOperationException", s"$m not allowed")
      }

    case ("POST", List("namespaces", nsSeg, "properties")) =>
      val ns = splitNs(nsSeg)
      val req = readJson(ex)
      val updates = propertiesFromNode(req, "updates")
      val removals = stringSeq(req, "removals")
      val before = backing.loadNamespaceProperties(ns)
      backing.updateNamespaceProperties(ns, updates, removals.toSet)
      val o = newObject()
      val up = o.putArray("updated"); updates.keys.toSeq.sorted.foreach(up.add)
      val rm = o.putArray("removed")
      removals.filter(before.contains).foreach(rm.add)
      val miss = o.putArray("missing")
      removals.filterNot(before.contains).foreach(miss.add)
      reply(ex, 200, o.toString)

    case ("GET", List("namespaces", nsSeg, "tables")) =>
      val ns = splitNs(nsSeg)
      if (!backing.namespaceExists(ns))
        throw new NoSuchNamespaceException(s"no such namespace: ${ns.mkString(".")}")
      val all = backing.listTables(ns)
      val (pageRows, nextTok) = page(all, query)
      val o = newObject()
      val arr = o.putArray("identifiers")
      pageRows.foreach(t => arr.add(identifierToJson(t)))
      nextTok.foreach(o.put("next-page-token", _))
      reply(ex, 200, o.toString)

    case ("POST", List("namespaces", nsSeg, "tables")) =>
      createTable(ex, splitNs(nsSeg))

    case ("POST", List("tables", "rename")) =>
      val req = readJson(ex)
      val src = identifierFromJson(req.get("source"))
      val dst = identifierFromJson(req.get("destination"))
      try {
        backing.renameTable(src, dst)
        reply(ex, 204, "")
      } catch {
        case e: UnsupportedOperationException =>
          throw HttpError(406, "UnsupportedOperationException", e.getMessage)
      }

    case ("POST", List("namespaces", nsSeg, "register")) =>
      val ns = splitNs(nsSeg)
      val req = readJson(ex)
      val ident = TableIdentifier(ns, req.get("name").asText)
      val loc = req.get("metadata-location").asText
      if (Option(req.get("overwrite")).exists(_.asBoolean) && backing.tableExists(ident))
        backing.dropTable(ident)
      val ref = backing.registerTable(ident, loc)
      reply(ex, 200, loadTableResult(backing.metadataLocation(ident), ref.metadata, ref.version))

    case ("POST", List("namespaces", nsSeg, "tables", name, "plan")) =>
      planTable(ex, TableIdentifier(splitNs(nsSeg), name))

    case ("GET", List("namespaces", nsSeg, "tables", name, "plan", planId)) =>
      planPage(ex, TableIdentifier(splitNs(nsSeg), name), planId, query)

    // cancel/release a parked plan (the spec's DELETE on the plan-id):
    // idempotent — deleting an unknown/expired id is a no-op 204
    case ("DELETE", List("namespaces", nsSeg, "tables", name, "plan", planId)) =>
      planCache.remove(planKey(TableIdentifier(splitNs(nsSeg), name), planId))
      reply(ex, 204, "")

    case (m, List("namespaces", nsSeg, "tables", name)) =>
      val ident = TableIdentifier(splitNs(nsSeg), name)
      m match {
        case "GET" =>
          val ref = backing.loadTable(ident)
          reply(ex, 200,
            loadTableResult(backing.metadataLocation(ident), ref.metadata, ref.version))
        case "HEAD" =>
          reply(ex, if (backing.tableExists(ident)) 204 else 404, "")
        case "DELETE" =>
          val purge = query.get("purgeRequested").contains("true")
          if (backing.dropTable(ident, purge)) reply(ex, 204, "")
          else throw new NoSuchTableException(s"no such table: $ident")
        case "POST" => commitTable(ex, ident)
        case _ => throw HttpError(405, "UnsupportedOperationException", s"$m not allowed")
      }

    case _ =>
      throw HttpError(404, "NoSuchEndpointException",
        s"$method /v1/${segs.mkString("/")}")
  }

  // ---------- server-side scan planning ----------

  /** POST .../tables/{t}/plan (the public REST spec's PlanTableScan):
    * the SERVER runs manifest-pruned scan planning and returns the file
    * list, so a thin client scans without ever reading table metadata —
    * the reference's REST types declare the broader protocol
    * (catalog/rest/types.h:37-121); this is its planning surface made
    * executable. Small plans complete synchronously (plan-status
    * "completed"); a table whose snapshot summary reports at least
    * `asyncPlanThresholdFiles` data files takes the ASYNC handshake
    * instead — the POST returns plan-status "submitted" + a plan-id
    * immediately (planning continues on a dedicated pool, never holding
    * an HTTP thread), and the client polls GET .../plan/{id} until
    * "completed", then walks pages as usual. The full pruning stack
    * (partition summaries, file metrics, transform projections) runs
    * server-side through the same ScanBuilder as local planning — one
    * planner, two transports. */
  private def planTable(ex: HttpExchange, ident: TableIdentifier): Unit = {
    val req = readJson(ex)
    val t = graft.ice.IceTable.load(backing, ident)
    // an unknown snapshot-id is the CLIENT's error — refuse up front with
    // a 404, never a silent fallback to the current snapshot (the delete
    // set and reported snapshot-id would belong to the wrong snapshot)
    val reqSnap = Option(req.get("snapshot-id")).map(_.asLong)
    val snap = reqSnap match {
      case Some(sid) => Some(t.metadata.snapshotById(sid).getOrElse(
        throw HttpError(404, "NoSuchSnapshotException",
          s"no snapshot $sid in table $ident")))
      case None => t.currentSnapshot
    }
    var scan = t.newScan()
    reqSnap.foreach(sid => scan = scan.useSnapshot(sid))
    Option(req.get("case-sensitive")).foreach(cs =>
      scan = scan.withCaseSensitive(cs.asBoolean))
    Option(req.get("filter")).foreach(f => scan = scan.filter(exprFromJson(f)))
    // data-file<->delete-file linkage (delete-file-references): sequence
    // visibility resolves SERVER-side per task — pos deletes apply at
    // deleteSeq >= dataSeq (file-scoped ones only to their referenced
    // file), equality deletes at deleteSeq > dataSeq — so a thin client
    // never needs sequence numbers to read MoR-correctly
    val deleteEntries = snap.map(t.planDeleteEntries).getOrElse(Nil)
    import graft.ice.manifest.{FileContent, ManifestAvro}
    val plannedDeletes = deleteEntries.map { e =>
      PlannedDelete(e.dataFile.filePath,
        if (e.dataFile.content == FileContent.PositionDeletes) "position-deletes"
        else "equality-deletes",
        e.dataFile.contentOffset, e.dataFile.contentSizeInBytes,
        e.dataFile.equalityIds, e.dataFile.referencedDataFile)
    }
    def refsFor(task: graft.ice.FileScanTask): Seq[Int] = {
      val p = ManifestAvro.stripFileScheme(task.file.filePath)
      deleteEntries.zipWithIndex.collect {
        case (e, i) if e.dataFile.content == FileContent.PositionDeletes &&
            e.sequenceNumber.getOrElse(0L) >= task.sequenceForVisibility &&
            e.dataFile.referencedDataFile.forall(r =>
              ManifestAvro.stripFileScheme(r) == p) => i
        case (e, i) if e.dataFile.content == FileContent.EqualityDeletes &&
            e.sequenceNumber.getOrElse(0L) > task.sequenceForVisibility => i
      }
    }
    def computePlan(): PlanResult = {
      val tasks = scan.planFiles().map(task => PlannedTask(
        task.file.filePath, task.file.fileFormat,
        task.file.recordCount, task.file.fileSizeInBytes, refsFor(task)))
      PlanResult(tasks, plannedDeletes, snap.map(_.snapshotId).getOrElse(-1L))
    }
    val estFiles = snap.flatMap(_.summary.get("total-data-files"))
      .flatMap(_.toLongOption).getOrElse(0L)
    if (estFiles >= asyncPlanThresholdFiles) {
      // ASYNC handshake: park a pending plan, answer immediately, plan
      // on the dedicated pool. Snapshot/filter validation already ran
      // synchronously above — a bad request still fails the POST.
      val planId = java.util.UUID.randomUUID().toString
      evictExpiredPlans()
      val parked = new ParkedPlan
      planCache.put(planKey(ident, planId), (System.currentTimeMillis(), parked))
      planPool.submit(new Runnable {
        def run(): Unit =
          try parked.state = PlanDone(computePlan())
          catch { case e: Throwable =>
            parked.state = PlanFailed(
              s"${e.getClass.getSimpleName}: ${e.getMessage}")
          }
      })
      reply(ex, 200, planSubmittedJson(planId).toString)
      return
    }
    val result = computePlan()
    // paged flavor (types.h:74 PageToken): with "page-size" the finished
    // plan is parked server-side under a plan-id and served in slices —
    // a million-file plan is never one JSON allocation on either side.
    // Delete files ride the FIRST response only (the client needs them
    // before reading any task; they are a small fraction of tasks).
    Option(req.get("page-size")).map(_.asInt) match {
      case Some(sz) if sz > 0 && result.tasks.sizeIs > sz =>
        val planId = java.util.UUID.randomUUID().toString
        evictExpiredPlans()
        planCache.put(planKey(ident, planId),
          (System.currentTimeMillis(), new ParkedPlan(PlanDone(result))))
        reply(ex, 200, planResultToJson(
          result.copy(tasks = result.tasks.take(sz)),
          Some(planId), Some(sz.toString)).toString)
      case _ =>
        reply(ex, 200, planResultToJson(result).toString)
    }
  }

  /** GET .../plan/{planId}?pageToken=N&pageSize=S — subsequent pages of
    * a parked plan. Tokens are task-list offsets, same shape as the list
    * endpoints' paging. */
  private def planPage(ex: HttpExchange, ident: TableIdentifier, planId: String,
      query: Map[String, String]): Unit = {
    // keyed by (table, planId) so a plan-id is only servable under the
    // table URL it was parked for, and TTL-checked here too — a stale
    // plan must 404 even if no later park has triggered eviction yet
    val parked = Option(planCache.get(planKey(ident, planId)))
      .filter { case (created, _) =>
        System.currentTimeMillis() - created <= planTtlMs
      }.map(_._2).getOrElse(
        throw HttpError(404, "NoSuchPlanException",
          s"no such plan for $ident (expired or never created): $planId"))
    parked.state match {
      case PlanRunning =>
        reply(ex, 200, planSubmittedJson(planId).toString)
      case PlanFailed(msg) =>
        reply(ex, 200, planFailedJson(planId, msg).toString)
      case PlanDone(cached) =>
        val start = query.get("pageToken").flatMap(_.toIntOption).getOrElse(0)
        val size = query.get("pageSize").flatMap(_.toIntOption)
          .getOrElse(cached.tasks.size)
        val next =
          if (start + size < cached.tasks.size) Some((start + size).toString)
          else None
        // delete files ride the FIRST fetch: in the async flow the
        // client's first sight of the plan is this GET (no pageToken),
        // and reading MoR tables without them resurrects deleted rows
        val dels = if (query.contains("pageToken")) Nil else cached.deleteFiles
        reply(ex, 200, planResultToJson(
          PlanResult(cached.tasks.slice(start, start + size), dels,
            cached.snapshotId),
          Some(planId), next).toString)
    }
  }

  /** Parked plans: (table#planId) -> (createdMs, state). TTL-evicted on
    * each park; bounded so an abandoned client cannot pin memory. A plan
    * is Running (async, still computing), Done, or Failed. */
  private sealed trait PlanState
  private case object PlanRunning extends PlanState
  private final case class PlanDone(result: PlanResult) extends PlanState
  private final case class PlanFailed(message: String) extends PlanState
  private final class ParkedPlan(initial: PlanState = PlanRunning) {
    @volatile var state: PlanState = initial
  }
  private val planCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, ParkedPlan)]()
  private def planKey(ident: TableIdentifier, planId: String): String =
    ident.toString + "#" + planId
  private val planTtlMs = 10L * 60 * 1000
  private val maxParkedPlans = 64
  private def evictExpiredPlans(): Unit = {
    val now = System.currentTimeMillis()
    planCache.entrySet.removeIf(e => now - e.getValue._1 > planTtlMs)
    while (planCache.size >= maxParkedPlans) {
      val oldest = planCache.entrySet.asScala.minBy(_.getValue._1)
      planCache.remove(oldest.getKey); ()
    }
  }

  // ---------- table create / commit ----------

  private def createTable(ex: HttpExchange, ns: Seq[String]): Unit = {
    val req = readJson(ex)
    val ident = TableIdentifier(ns, req.get("name").asText)
    val schema = MetaJson.schemaFromJson(req.get("schema"))
    val spec = Option(req.get("partition-spec")).map(MetaJson.specFromJson)
      .getOrElse(PartitionSpec.unpartitioned)
    val order = Option(req.get("write-order")).map(MetaJson.sortOrderFromJson)
      .getOrElse(SortOrder.unsorted)
    val props = propertiesFromNode(req, "properties")
    val loc = Option(req.get("location")).map(_.asText)
    val staged = Option(req.get("stage-create")).exists(_.asBoolean)
    if (staged) {
      // nothing is published; the client's first commit carries
      // assert-create + the full rebuild update list
      val ref = backing.stageCreateTable(ident, schema, spec, order, props, loc)
      reply(ex, 200, loadTableResult(None, ref.metadata, 0))
    } else {
      val ref = backing.createTable(ident, schema, spec, order, props, loc)
      reply(ex, 200,
        loadTableResult(backing.metadataLocation(ident), ref.metadata, ref.version))
    }
  }

  private def commitTable(ex: HttpExchange, ident: TableIdentifier): Unit = {
    val req = readJson(ex)
    val requirements = Option(req.get("requirements"))
      .map(_.elements.asScala.map(requirementFromJson).toSeq).getOrElse(Nil)
    val updates = Option(req.get("updates"))
      .map(_.elements.asScala.map(updateFromJson).toSeq).getOrElse(Nil)

    val isCreate = requirements.contains(AssertCreate)
    if (isCreate) {
      if (backing.tableExists(ident))
        throw new AlreadyExistsException(s"table $ident already exists (assert-create)")
      val built = applyUpdates(emptyBase, updates)
        .copy(lastUpdatedMs = System.currentTimeMillis())
      val v = backing.commit(ident, 0, built)
      reply(ex, 200, loadTableResult(backing.metadataLocation(ident), built, v))
    } else {
      val current = backing.loadTable(ident)
      requirements.flatMap(_.check(current.metadata)).headOption.foreach { violation =>
        throw new RequirementFailedException(s"$ident: $violation")
      }
      val built0 = applyUpdates(current.metadata, updates)
      val built = if (built0.lastUpdatedMs > current.metadata.lastUpdatedMs) built0
        else built0.copy(lastUpdatedMs = System.currentTimeMillis())
      val v = backing.commit(ident, current.version, built)
      reply(ex, 200, loadTableResult(backing.metadataLocation(ident), built, v))
    }
  }

  // ---------- helpers ----------

  /** Namespace path segment: levels joined by the 0x1F unit separator
    * (already percent-decoded by URI.getPath). */
  private def splitNs(seg: String): Seq[String] =
    seg.split('\u001F').toSeq.filter(_.nonEmpty)

  private def parseQuery(raw: Option[String]): Map[String, String] =
    raw.getOrElse("").split('&').filter(_.contains("=")).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      java.net.URLDecoder.decode(k, UTF_8) -> java.net.URLDecoder.decode(v, UTF_8)
    }.toMap

  /** Offset-token pagination (types.h:74 PageToken): token = start index. */
  private def page[T](all: Seq[T], query: Map[String, String]): (Seq[T], Option[String]) = {
    val start = query.get("pageToken").flatMap(_.toIntOption).getOrElse(0)
    query.get("pageSize").flatMap(_.toIntOption) match {
      case None => (all.drop(start), None)
      case Some(size) =>
        val slice = all.slice(start, start + size)
        val next = if (start + size < all.length) Some((start + size).toString) else None
        (slice, next)
    }
  }

  private def readJson(ex: HttpExchange): JsonNode =
    parse(new String(ex.getRequestBody.readAllBytes(), UTF_8))

  private def reply(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    if (body.nonEmpty)
      ex.getResponseHeaders.add("Content-Type", "application/json")
    // HEAD/204 replies carry no body (-1 = no content)
    if (bytes.isEmpty || ex.getRequestMethod == "HEAD") {
      ex.sendResponseHeaders(code, -1)
    } else {
      ex.sendResponseHeaders(code, bytes.length)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }
  }
}

object RestCatalogServer {
  private final case class HttpError(code: Int, errType: String, message: String)
    extends RuntimeException(message)
}
