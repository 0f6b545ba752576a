package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ice._
import graft.ice.catalog._
import graft.ice.meta._
import graft.ice.types._

/** C3: REST catalog client + in-process localhost server (the reference
  * tests the same way: httplib server bound to 127.0.0.1,
  * rest_catalog_test.cc:36-44). Every table-layer operation runs through
  * HTTP; the backing store is a DirCatalog the client never touches
  * directly. */
class RestCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-rest-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sfDir = "/root/testdata/sf0.001"

  private def tmpWarehouse(): String =
    java.nio.file.Files.createTempDirectory("rest-warehouse").toString

  /** Run `f` with a live server + client pair, always stopping the server. */
  private def withRest[T](token: Option[String] = None)(
      f: (RestCatalog, RestCatalogServer, DirCatalog) => T): T = {
    val backing = new DirCatalog(tmpWarehouse())
    val server = new RestCatalogServer(backing, token = token)
    try f(new RestCatalog(server.baseUrl, token), server, backing)
    finally server.stop()
  }

  private def sampleSchema: Schema =
    SparkConv.fromSpark(spark.read.parquet(s"$sfDir/region.parquet").schema)

  test("config endpoint answers (reference GetConfig, rest_catalog.cc:33-37)") {
    withRest() { (cat, _, _) => assert(cat.config.isEmpty) }
  }

  test("namespace CRUD + properties over the wire") {
    withRest() { (cat, _, _) =>
      assert(cat.listNamespaces() == Nil)
      cat.createNamespace(Seq("prod"), Map("owner" -> "graft"))
      cat.createNamespace(Seq("prod", "raw"))
      cat.createNamespace(Seq("dev"))
      assert(cat.listNamespaces() == Seq(Seq("dev"), Seq("prod")))
      assert(cat.listNamespaces(Seq("prod")) == Seq(Seq("prod", "raw")))
      assert(cat.namespaceExists(Seq("prod")))
      assert(!cat.namespaceExists(Seq("nope")))
      assert(cat.loadNamespaceProperties(Seq("prod")) == Map("owner" -> "graft"))

      cat.updateNamespaceProperties(Seq("prod"),
        updates = Map("retention" -> "30d"), removals = Set("owner"))
      assert(cat.loadNamespaceProperties(Seq("prod")) == Map("retention" -> "30d"))

      intercept[AlreadyExistsException] { cat.createNamespace(Seq("dev")) }
      intercept[NoSuchNamespaceException] { cat.loadNamespaceProperties(Seq("nope")) }
      assert(cat.dropNamespace(Seq("dev")))
      assert(!cat.dropNamespace(Seq("dev")))
      // non-empty namespace refuses to drop
      intercept[RuntimeException] { cat.dropNamespace(Seq("prod")) }
    }
  }

  test("create + load + list + exists + drop table over the wire") {
    withRest() { (cat, _, backing) =>
      cat.createNamespace(Seq("db"))
      val ident = TableIdentifier(Seq("db"), "region")
      val ref = cat.createTable(ident, sampleSchema)
      assert(ref.version == 1)
      assert(cat.tableExists(ident))
      assert(cat.listTables(Seq("db")) == Seq(ident))
      // the table is real in the backing store, not a client-side illusion
      assert(backing.tableExists(ident))

      val loaded = cat.loadTable(ident)
      assert(loaded.metadata.tableUuid == ref.metadata.tableUuid)
      assert(loaded.metadata.currentSchema.fields.map(_.name) ==
        ref.metadata.currentSchema.fields.map(_.name))

      intercept[AlreadyExistsException] { cat.createTable(ident, sampleSchema) }
      assert(cat.dropTable(ident))
      assert(!cat.tableExists(ident))
      assert(!cat.dropTable(TableIdentifier(Seq("db"), "ghost")))
      intercept[NoSuchTableException] { cat.loadTable(ident) }
    }
  }

  test("append + scan through the REST catalog (IceTable end to end)") {
    withRest() { (cat, server, _) =>
      cat.createNamespace(Seq("db"))
      val ident = TableIdentifier(Seq("db"), "region")
      val raw = spark.read.parquet(s"$sfDir/region.parquet")
      val t = IceTable.create(cat, ident, SparkConv.fromSpark(raw.schema))
      t.append(spark).appendDataFrame(raw)

      // a FRESH client sees the committed data (nothing client-local)
      val t2 = IceTable.load(new RestCatalog(server.baseUrl), ident)
      assert(t2.newScan().toDF(spark).count() == raw.count())
      // second append advances the version through the wire
      t.append(spark).appendDataFrame(raw.limit(2))
      assert(cat.loadTable(ident).version == 3)
      assert(IceTable.load(cat, ident).newScan().toDF(spark).count() == raw.count() + 2)
    }
  }

  test("server-side scan planning: pruned tasks, thin-client read, filters over the wire") {
    import org.apache.spark.sql.functions.col
    withRest() { (cat, server, _) =>
      cat.createNamespace(Seq("db"))
      val ident = TableIdentifier(Seq("db"), "nation_plan")
      val raw = spark.read.parquet(s"$sfDir/nation.parquet")
      val schema = SparkConv.fromSpark(raw.schema)
      val keyId = schema.findFieldByName("n_regionkey").get.id
      val spec = PartitionSpec(0, IndexedSeq(PartitionField(
        keyId, 1000, "n_regionkey", graft.ice.transform.IdentityTransform)))
      val t = IceTable.create(cat, ident, schema, spec)
      t.append(spark).appendDataFrame(raw) // 5 regionkeys -> >=5 files

      val all = cat.planScan(ident)
      assert(all.tasks.nonEmpty)
      assert(all.tasks.size >= 5, "identity partitioning must split files")
      assert(all.deleteFiles.isEmpty)
      assert(all.snapshotId == t.currentSnapshot.get.snapshotId)

      // the SAME pruning gate as the local planner: an identity
      // predicate plans <= 1/4 of the table's files
      val pruned = cat.planScan(ident, Some(graft.ice.expr.Expr.equal(
        "n_regionkey", graft.ice.types.Literal.long(0))))
      assert(pruned.tasks.nonEmpty)
      assert(pruned.tasks.size * 4 <= all.tasks.size,
        s"server-side pruning too weak: ${pruned.tasks.size}/${all.tasks.size} files")
      // server planning == local planning, task for task
      val local = t.newScan().filter(graft.ice.expr.Expr.equal(
        "n_regionkey", graft.ice.types.Literal.long(0))).planFiles()
        .map(_.file.filePath).toSet
      assert(pruned.tasks.map(_.path).toSet == local)

      // thin-client read: ONLY the planned files, residual client-side
      val paths = pruned.tasks.map(p =>
        graft.ice.manifest.ManifestAvro.stripFileScheme(p.path))
      val rows = spark.read.parquet(paths: _*)
        .filter(col("n_regionkey") === 0)
      assert(rows.count() == raw.filter(col("n_regionkey") === 0).count())

      // complex filters travel: OR of two keys plans the union of groups
      val two = cat.planScan(ident, Some(graft.ice.expr.Expr.or(
        graft.ice.expr.Expr.equal("n_regionkey", graft.ice.types.Literal.long(0)),
        graft.ice.expr.Expr.equal("n_regionkey", graft.ice.types.Literal.long(3)))))
      assert(two.tasks.size > pruned.tasks.size)
      assert(two.tasks.size < all.tasks.size)

      // expression serde round-trip is identity on the wire shapes
      import graft.ice.catalog.RestJson.{exprFromJson, exprToJson}
      val e = graft.ice.expr.Expr.and(
        graft.ice.expr.Expr.in("a", Seq(graft.ice.types.Literal.long(1),
          graft.ice.types.Literal.long(2))),
        graft.ice.expr.Expr.not(graft.ice.expr.Expr.isNull("b")))
      assert(exprFromJson(RestJson.parse(exprToJson(e).toString)) == e)
      // snapshot pinning: planning an older snapshot returns its files
      t.append(spark).appendDataFrame(raw.limit(1))
      val pinned = cat.planScan(ident, snapshotId = Some(all.snapshotId))
      assert(pinned.tasks.map(_.path).toSet == all.tasks.map(_.path).toSet)
    }
  }

  test("plan pagination, unknown-snapshot 404, temporal filter binding") {
    import org.apache.spark.sql.functions.{col, lit}
    withRest() { (cat, server, _) =>
      cat.createNamespace(Seq("db"))
      val ident = TableIdentifier(Seq("db"), "nation_paged")
      val raw = spark.read.parquet(s"$sfDir/nation.parquet")
      val schema = SparkConv.fromSpark(raw.schema)
      val keyId = schema.findFieldByName("n_regionkey").get.id
      val spec = PartitionSpec(0, IndexedSeq(PartitionField(
        keyId, 1000, "n_regionkey", graft.ice.transform.IdentityTransform)))
      val t = IceTable.create(cat, ident, schema, spec)
      t.append(spark).appendDataFrame(raw) // 5 regionkeys -> >=5 files

      val unpaged = cat.planScan(ident)
      assert(unpaged.tasks.size >= 5)
      // page-size 2 forces >= 3 wire pages; the merged client result must
      // equal the unpaged plan task for task, order included
      val paged = cat.planScan(ident, pageSize = Some(2))
      assert(paged.tasks == unpaged.tasks,
        s"paged plan diverged: ${paged.tasks.size} vs ${unpaged.tasks.size} tasks")
      assert(paged.snapshotId == unpaged.snapshotId)
      assert(paged.deleteFiles == unpaged.deleteFiles)
      // and task-for-task equality with the LOCAL planner stays pinned
      assert(paged.tasks.map(_.path).toSet ==
        t.newScan().planFiles().map(_.file.filePath).toSet)

      // an unknown snapshot-id refuses up front with a 404 — never a
      // silent fallback to the current snapshot's files/deletes
      val ex = intercept[RuntimeException] {
        cat.planScan(ident, snapshotId = Some(123456789L))
      }
      assert(ex.getMessage.contains("NoSuchSnapshotException") ||
        ex.getMessage.contains("no snapshot"), ex.getMessage)

      // temporal literals travel as ISO strings and BIND server-side: a
      // date filter prunes by file metrics exactly like the local planner
      val ordRaw = spark.read.parquet(s"$sfDir/orders.parquet")
        .select("o_orderkey", "o_orderdate")
      val oid = TableIdentifier(Seq("db"), "orders_dates")
      val ot = IceTable.create(cat, oid, SparkConv.fromSpark(ordRaw.schema))
      val cutStr = "1998-01-01"
      ot.append(spark).appendDataFrame(
        ordRaw.filter(col("o_orderdate") < lit(cutStr).cast("date")))
      ot.append(spark).appendDataFrame(
        ordRaw.filter(col("o_orderdate") >= lit(cutStr).cast("date")))
      val cut = graft.ice.types.Literal.date(
        java.time.LocalDate.parse(cutStr).toEpochDay.toInt)
      val datePlan = cat.planScan(oid,
        Some(graft.ice.expr.Expr.lt("o_orderdate", cut)))
      val localPlan = IceTable.load(cat, oid).newScan()
        .filter(graft.ice.expr.Expr.lt("o_orderdate", cut))
        .planFiles().map(_.file.filePath).toSet
      assert(datePlan.tasks.nonEmpty)
      assert(datePlan.tasks.map(_.path).toSet == localPlan,
        "date filter must prune identically over the wire")
      assert(datePlan.tasks.size <
        IceTable.load(cat, oid).newScan().planFiles().size,
        "date filter must actually prune files")
    }
  }

  test("async plan handshake: submitted -> poll -> completed, task-for-task " +
      "equal to the sync plan; cancel releases the plan-id") {
    val backing = new DirCatalog(tmpWarehouse())
    // forced async: ANY snapshot with >= 1 data file takes the handshake
    val server = new RestCatalogServer(backing, asyncPlanThresholdFiles = 1)
    try {
      val cat = new RestCatalog(server.baseUrl)
      cat.createNamespace(Seq("db"))
      val ident = TableIdentifier(Seq("db"), "nation_async")
      val raw = spark.read.parquet(s"$sfDir/nation.parquet")
      val schema = SparkConv.fromSpark(raw.schema)
      val keyId = schema.findFieldByName("n_regionkey").get.id
      val spec = PartitionSpec(0, IndexedSeq(PartitionField(
        keyId, 1000, "n_regionkey", graft.ice.transform.IdentityTransform)))
      val t = IceTable.create(cat, ident, schema, spec)
      t.append(spark).appendDataFrame(raw)

      // raw POST proves the handshake shape: submitted + plan-id, no tasks
      val url = new java.net.URI(
        s"${server.baseUrl}/v1/namespaces/db/tables/nation_async/plan").toURL
      val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST"); conn.setDoOutput(true)
      conn.getOutputStream.write("{}".getBytes("UTF-8"))
      val body = new String(conn.getInputStream.readAllBytes(), "UTF-8")
      assert(body.contains("\"plan-status\":\"submitted\""), body)
      assert(body.contains("plan-id"), body)
      assert(!body.contains("file-scan-tasks"), body)

      // client API polls through to completion; result equals the sync
      // planner's, paged and unpaged
      val asyncPlan = cat.planScan(ident)
      val asyncPaged = cat.planScan(ident, pageSize = Some(2))
      val local = t.newScan().planFiles().map(_.file.filePath).toSet
      assert(asyncPlan.tasks.map(_.path).toSet == local)
      assert(asyncPaged.tasks == asyncPlan.tasks)

      // filters still prune through the async path
      val pruned = cat.planScan(ident,
        Some(graft.ice.expr.Expr.equal("n_regionkey",
          graft.ice.types.Literal.long(0))))
      assert(pruned.tasks.nonEmpty && pruned.tasks.size < asyncPlan.tasks.size)

      // cancel is idempotent and the id stops serving
      cat.cancelPlan(ident, "no-such-plan") // no-op 204
    } finally server.stop()
  }

  test("plan wire carries task<->delete linkage with sequence visibility") {
    import org.apache.spark.sql.functions.col
    withRest() { (cat, _, _) =>
      cat.createNamespace(Seq("db"))
      val ident = TableIdentifier(Seq("db"), "ordmor")
      val raw = spark.read.parquet(s"$sfDir/orders.parquet")
        .select("o_orderkey", "o_totalprice")
      val t = IceTable.create(cat, ident, SparkConv.fromSpark(raw.schema))
      t.append(spark).appendDataFrame(raw.repartition(2))        // seq 1
      t.delete(spark).deleteWherePositional(                      // seq 2
        graft.ice.expr.Expr.lt("o_orderkey", graft.ice.types.Literal.long(50)))
      t.append(spark).appendDataFrame(                            // seq 3
        raw.limit(5).withColumn("o_orderkey",
          col("o_orderkey") + org.apache.spark.sql.functions.lit(900000L)))

      val plan = cat.planScan(ident)
      assert(plan.deleteFiles.nonEmpty)
      assert(plan.deleteFiles.forall(_.content == "position-deletes"))
      // pre-delete data files (seq 1) reference the delete; the append
      // AFTER the delete (seq 3) must not — sequence rules are resolved
      // server-side so a thin client never sees sequence numbers
      val (withRefs, without) = plan.tasks.partition(_.deleteRefs.nonEmpty)
      assert(withRefs.size == 2 && without.size >= 1,
        s"refs: ${plan.tasks.map(t => t.path -> t.deleteRefs)}")
      assert(withRefs.flatMap(_.deleteRefs).distinct.forall(
        i => i >= 0 && i < plan.deleteFiles.size))

      // thin-client MoR read == scan API read (the linkage is sufficient)
      def strip(p: String) = graft.ice.manifest.ManifestAvro.stripFileScheme(p)
      val data = spark.read.parquet(plan.tasks.map(x => strip(x.path)): _*)
        .withColumn("__f", org.apache.spark.sql.functions.regexp_replace(
          col("_metadata.file_path"), "^file:/*", "/"))
        .withColumn("__p", col("_metadata.row_index"))
      val refd = plan.tasks.flatMap(_.deleteRefs).distinct.map(plan.deleteFiles)
      val dels = spark.read.parquet(refd.map(d => strip(d.path)): _*)
        .select(org.apache.spark.sql.functions.regexp_replace(
          col("file_path"), "^file:/*", "/").as("__df"), col("pos").as("__dp"))
      val thin = data.join(dels,
          data("__f") === dels("__df") && data("__p") === dels("__dp"), "left_anti")
        .select("o_orderkey", "o_totalprice")
      val api = IceTable.load(cat, ident).newScan().toDF(spark)
        .select("o_orderkey", "o_totalprice")
      assert(thin.collect().map(_.toString).sorted.toSeq ==
        api.collect().map(_.toString).sorted.toSeq)
    }
  }

  test("partition statistics and rollback timestamps survive the wire") {
    withRest() { (cat, server, _) =>
      cat.createNamespace(Seq("db"))
      val ident = TableIdentifier(Seq("db"), "pstats")
      val raw = spark.read.parquet(s"$sfDir/region.parquet")
      val t = IceTable.create(cat, ident, SparkConv.fromSpark(raw.schema))
      t.append(spark).appendDataFrame(raw)
      // partition stats registered through a REST commit must land in the
      // authoritative metadata (set-partition-statistics update)
      val psf = graft.ice.write.Statistics.computePartitionStats(t, spark)
      val reloaded = IceTable.load(new RestCatalog(server.baseUrl), ident)
      assert(reloaded.metadata.partitionStatistics == Seq(psf))

      // rollback via REST: the snapshotLog entry is stamped at COMMIT
      // time (local-catalog semantics), never the old snapshot's original
      // timestamp — TIMESTAMP AS OF must resolve identically
      val s1 = t.currentSnapshot.get
      t.append(spark).appendDataFrame(raw.limit(1))
      val before = System.currentTimeMillis()
      t.manageSnapshots().rollbackTo(s1.snapshotId)
      val log = IceTable.load(cat, ident).metadata.snapshotLog
      assert(log.last.snapshotId == s1.snapshotId)
      assert(log.last.timestampMs >= before,
        s"rollback log entry dated in the past: ${log.last.timestampMs} < $before")
      assert(log.map(_.timestampMs) == log.map(_.timestampMs).sorted,
        "snapshotLog must stay monotonic across a REST rollback")
    }
  }

  test("staged create (CTAS): invisible until the assert-create commit") {
    withRest() { (cat, _, backing) =>
      cat.createNamespace(Seq("db"))
      val ident = TableIdentifier(Seq("db"), "ctas")
      val raw = spark.read.parquet(s"$sfDir/region.parquet")
      val ref = cat.buildTable(ident, SparkConv.fromSpark(raw.schema))
        .withProperty("graft.ctas", "true")
        .stageCreate()
      assert(ref.version == 0)
      assert(!backing.tableExists(ident)) // nothing published yet

      val (staged, tx) = IceTable.stageCreate(ref, spark)
      tx.append(raw)
      tx.commitTransaction()

      assert(backing.tableExists(ident))
      val t = IceTable.load(cat, ident)
      assert(t.newScan().toDF(spark).count() == raw.count())
      assert(t.metadata.properties.get("graft.ctas").contains("true"))
      // staging the same name again is refused outright
      intercept[AlreadyExistsException] {
        cat.stageCreateTable(ident, SparkConv.fromSpark(raw.schema))
      }
      // and a staged create that LOSES the publish race fails assert-create
      val ident2 = TableIdentifier(Seq("db"), "ctas2")
      val ref2 = cat.stageCreateTable(ident2, SparkConv.fromSpark(raw.schema))
      cat.createTable(ident2, SparkConv.fromSpark(raw.schema)) // rival publishes first
      intercept[AlreadyExistsException] { cat.commit(ident2, 0, ref2.metadata) }
    }
  }

  test("register table round-trips through the wire") {
    withRest() { (cat, _, backing) =>
      cat.createNamespace(Seq("db"))
      val src = TableIdentifier(Seq("db"), "src")
      val raw = spark.read.parquet(s"$sfDir/region.parquet")
      val t = IceTable.create(cat, src, SparkConv.fromSpark(raw.schema))
      t.append(spark).appendDataFrame(raw)
      val loc = backing.metadataLocation(src).get
      val dst = TableIdentifier(Seq("db"), "registered")
      val ref = cat.registerTable(dst, loc)
      assert(ref.metadata.currentSnapshotId == t.metadata.currentSnapshotId)
      assert(IceTable.load(cat, dst).newScan().toDF(spark).count() == raw.count())
    }
  }

  test("concurrent commits: loser gets 409 and IceTable's retry wins") {
    withRest() { (cat, server, _) =>
      cat.createNamespace(Seq("db"))
      val ident = TableIdentifier(Seq("db"), "race")
      val raw = spark.read.parquet(s"$sfDir/region.parquet")
      IceTable.create(cat, ident, SparkConv.fromSpark(raw.schema))

      // two independent clients loaded the SAME base version
      val a = IceTable.load(cat, ident)
      val b = IceTable.load(new RestCatalog(server.baseUrl), ident)
      a.append(spark).appendDataFrame(raw.limit(3))
      // b's base is stale; its commit must retry internally and still land
      b.append(spark).appendDataFrame(raw.limit(2))
      assert(IceTable.load(cat, ident).newScan().toDF(spark).count() == 5)
    }
  }

  test("requirement violation surfaces as CommitFailedException (409)") {
    withRest() { (cat, server, _) =>
      cat.createNamespace(Seq("db"))
      val ident = TableIdentifier(Seq("db"), "reqfail")
      cat.createTable(ident, sampleSchema)
      // a commit whose ref assert cannot hold (main is unborn, assert says 12345)
      val body = """{"requirements":[{"type":"assert-ref-snapshot-id","ref":"main",
        "snapshot-id":12345}],"updates":[]}""".stripMargin
      val http = java.net.http.HttpClient.newHttpClient()
      val resp = http.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(
          s"${server.baseUrl}/v1/namespaces/db/tables/reqfail"))
          .header("Content-Type", "application/json")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode == 409)
      assert(resp.body.contains("CommitFailedException"))
    }
  }

  test("bearer-token auth: wrong token is rejected, right token works") {
    withRest(token = Some("sekrit")) { (cat, server, _) =>
      cat.createNamespace(Seq("db"))
      assert(cat.listNamespaces() == Seq(Seq("db")))
      val bad = new RestCatalog(server.baseUrl, token = Some("wrong"))
      val e = intercept[RuntimeException] { bad.listNamespaces() }
      assert(e.getMessage.contains("401"))
      val none = new RestCatalog(server.baseUrl, token = None)
      intercept[RuntimeException] { none.listNamespaces() }
    }
  }

  test("list pagination: server pages, client reassembles") {
    withRest() { (cat, server, _) =>
      cat.createNamespace(Seq("db"))
      (1 to 7).foreach(i => cat.createTable(TableIdentifier(Seq("db"), f"t$i%02d"), sampleSchema))
      // raw page: 3 rows + a continuation token
      val http = java.net.http.HttpClient.newHttpClient()
      val resp = http.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(
          s"${server.baseUrl}/v1/namespaces/db/tables?pageSize=3")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(resp.body.contains("next-page-token"))
      assert("\"name\"".r.findAllIn(resp.body).size == 3)
      // client walks every page
      assert(cat.listTables(Seq("db")).map(_.name) == (1 to 7).map(i => f"t$i%02d"))
    }
  }

  test("multi-level namespaces travel as %1F-joined segments") {
    withRest() { (cat, _, _) =>
      cat.createNamespace(Seq("a"))
      cat.createNamespace(Seq("a", "b c")) // space forces percent-encoding
      assert(cat.listNamespaces(Seq("a")) == Seq(Seq("a", "b c")))
      assert(cat.namespaceExists(Seq("a", "b c")))
      val ident = TableIdentifier(Seq("a", "b c"), "t1")
      cat.createTable(ident, sampleSchema)
      assert(cat.listTables(Seq("a", "b c")) == Seq(ident))
      assert(cat.loadTable(ident).metadata.schemas.nonEmpty)
    }
  }

  test("rename travels the wire; path-coupled catalogs refuse loudly (406)") {
    withRest() { (cat, _, _) =>
      cat.createNamespace(Seq("db"))
      val src = TableIdentifier(Seq("db"), "a")
      cat.createTable(src, sampleSchema)
      // DirCatalog mirrors HadoopCatalog: renaming would break absolute
      // manifest paths, so it refuses — and the refusal survives the wire
      val e = intercept[UnsupportedOperationException] {
        cat.renameTable(src, TableIdentifier(Seq("db"), "b"))
      }
      assert(e.getMessage.contains("renameTable"))
      assert(cat.tableExists(src)) // nothing half-renamed
    }
  }

  test("diff/applyUpdates round-trips every durable metadata field") {
    val raw = spark.read.parquet(s"$sfDir/region.parquet")
    val cat = new DirCatalog(tmpWarehouse())
    val ident = TableIdentifier(Seq("db"), "roundtrip")
    val t = IceTable.create(cat, ident, SparkConv.fromSpark(raw.schema))
    t.append(spark).appendDataFrame(raw)
    t.manageSnapshots().createBranch("audit", t.currentSnapshot.get.snapshotId)
    t.append(spark).appendDataFrame(raw.limit(1))
    val target = t.metadata

    // a consistent earlier state: one snapshot, main pointing at it
    val first = t.metadata.snapshots.minBy(_.sequenceNumber)
    val base = IceTable.load(cat, ident).metadata.copy(
      snapshots = IndexedSeq(first),
      refs = Map("main" -> SnapshotRef(first.snapshotId, "branch")),
      currentSnapshotId = Some(first.snapshotId),
      snapshotLog = t.metadata.snapshotLog.take(1),
      properties = t.metadata.properties + ("stale" -> "yes"))
    val ups = RestJson.diff(base, target)
    val rebuilt = RestJson.applyUpdates(base, ups)
    assert(rebuilt.copy(lastUpdatedMs = 0, snapshotLog = IndexedSeq.empty) ==
      target.copy(lastUpdatedMs = 0, snapshotLog = IndexedSeq.empty))
    // snapshot log: same ids in order (timestamps come from the snapshots)
    assert(rebuilt.snapshotLog.map(_.snapshotId) == target.snapshotLog.map(_.snapshotId))
  }

  test("update + requirement JSON serde round-trips") {
    val sf = StatisticsFile(7L, "/tmp/s.puffin", 10L, 4L,
      Seq(BlobMetadata("apache-datasketches-theta-v1", 7L, 1L, Seq(1), Map("ndv" -> "5"))))
    val ups: Seq[RestJson.MetadataUpdate] = Seq(
      RestJson.AssignUuid("u-1"),
      RestJson.UpgradeFormatVersion(3),
      RestJson.SetCurrentSchema(-1),
      RestJson.SetDefaultSpec(2),
      RestJson.AddSnapshot(Snapshot(1L, None, 1L, 42L, "ml.avro",
        Map("operation" -> "append"), Some(0), Some(0L), Some(10L))),
      RestJson.SetSnapshotRef("main", SnapshotRef(1L, "branch", Some(3), None, Some(99L))),
      RestJson.RemoveSnapshots(Seq(4L, 5L)),
      RestJson.RemoveSnapshotRef("old"),
      RestJson.SetLocation("/w/t"),
      RestJson.SetProperties(Map("a" -> "1")),
      RestJson.RemoveProperties(Seq("b")),
      RestJson.SetStatistics(sf),
      RestJson.RemoveStatistics(7L))
    ups.foreach { u =>
      assert(RestJson.updateFromJson(RestJson.updateToJson(u)) == u, s"serde broke: $u")
    }
    val reqs: Seq[TableRequirement] = Seq(
      AssertCreate, AssertTableUuid("u"), AssertRefSnapshotId("main", Some(3L)),
      AssertRefSnapshotId("gone", None), AssertCurrentSchemaId(1),
      AssertDefaultSpecId(0), AssertDefaultSortOrderId(0),
      AssertLastAssignedFieldId(9), AssertLastAssignedPartitionId(1000))
    reqs.foreach { r =>
      assert(RestJson.requirementFromJson(RestJson.requirementToJson(r)) == r)
    }
  }

  test("commitLanded never adopts snapshot-free or snapshot-removing attempts (phantom commit)") {
    withRest() { (cat, _, _) =>
      import org.apache.spark.sql.functions.col
      val ident = TableIdentifier.parse("db.phantom")
      cat.createNamespace(Seq("db"))
      val df = spark.read.parquet(s"$sfDir/region.parquet")
      val t = IceTable.create(cat, ident, SparkConv.fromSpark(df.schema))
      t.append(spark).appendDataFrame(df)
      val base = cat.loadTable(ident)

      // 1. a snapshot-free (property-only) attempt that was NEVER sent:
      //    current version is below the attempted one -> provably not landed
      val propAttempt = base.metadata.copy(
        properties = base.metadata.properties + ("p" -> "1"))
      assert(cat.commitLanded(ident, base.version + 1, propAttempt,
        base.metadata) == Some(false),
        "unsent property attempt below current version must be Some(false)")

      // 2. same unsent property attempt, but a CONCURRENT writer advanced
      //    the version to the attempted one: base snapshot ids are a
      //    trivial subset of the server's — must be None, never Some(true)
      cat.commit(ident, base.version, base.metadata.copy(
        properties = base.metadata.properties + ("other" -> "x")))
      assert(cat.commitLanded(ident, base.version + 1, propAttempt,
        base.metadata).isEmpty,
        "snapshot-free attempt at/past current version is undecidable, not landed")

      // 3. a snapshot-REMOVING attempt (expiry shape) that never landed:
      //    adopting it would let removeOrphanFiles delete live files
      val cur = cat.loadTable(ident)
      val removing = cur.metadata.copy(snapshots = IndexedSeq.empty,
        currentSnapshotId = None)
      cat.commit(ident, cur.version, cur.metadata.copy(
        properties = cur.metadata.properties + ("racer" -> "y")))
      assert(cat.commitLanded(ident, cur.version + 1, removing,
        cur.metadata).isEmpty,
        "snapshot-removing attempt must never be adopted on a subset test")

      // 4. a snapshot-ADDING attempt that really landed: newly minted id
      //    present on the server -> Some(true)
      val before = cat.loadTable(ident)
      val t2 = IceTable.load(cat, ident)
      t2.append(spark).appendDataFrame(df.withColumn("r_name", col("r_name")))
      val after = cat.loadTable(ident)
      assert(cat.commitLanded(ident, after.version, after.metadata,
        before.metadata) == Some(true),
        "a landed snapshot-bearing attempt must reconcile to success")
    }
  }
}
