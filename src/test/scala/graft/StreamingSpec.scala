package graft

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps

class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(min: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusMinutes(min.toLong))

  test("watermarked hourly counts over a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    input.addData(
      (ts(5), "click", 1.0), (ts(10), "click", 2.0),
      (ts(65), "view", 3.0), (ts(70), "click", 4.0))
    // Append mode only emits watermark-closed windows; with a finite
    // MemoryStream nothing closes, so read the running state instead
    val out = StreamOps.runToMemory(spark,
      StreamOps.hourlyCounts(events), "hourly_test",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    val rows = out.collect().map(r =>
      (r.getAs[java.sql.Timestamp]("hour_start").toString,
        r.getAs[String]("event_type"), r.getAs[Long]("n"))).toSet
    assert(rows == Set(
      ("2024-01-01 00:00:00.0", "click", 2L),
      ("2024-01-01 01:00:00.0", "view", 1L),
      ("2024-01-01 01:00:00.0", "click", 1L)))
  }

  test("session windows with gap close after inactivity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val events = input.toDF().toDF("ts", "user_id", "value")
    // user 1: two events 10min apart (one session), then one 2h later
    input.addData((ts(0), 1L, 1.0), (ts(10), 1L, 1.0), (ts(130), 1L, 5.0))
    val out = StreamOps.runToMemory(spark,
      StreamOps.sessionWindows(events, gapMinutes = 30), "sessions_test",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    val sessions = out.filter(col("user_id") === 1).collect()
    assert(sessions.length == 2)
    assert(sessions.map(_.getAs[Long]("n_events")).sorted.toSeq == Seq(1L, 2L))
  }

  test("mapGroupsWithState sessionization carries custom state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.Event]
    input.addData(
      StreamOps.Event(1, ts(0), 7L, "click", 1.0),
      StreamOps.Event(2, ts(5), 7L, "click", 2.0),
      StreamOps.Event(3, ts(2), 8L, "view", 9.0))
    val updates = StreamOps.sessionizeWithState(input.toDS(), gapMinutes = 30)
    val q = updates.writeStream.format("memory").queryName("state_test")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.table("state_test").collect()
    val u7 = rows.find(_.getAs[Long]("user_id") == 7L).get
    assert(u7.getAs[Long]("n_events") == 2L)
    assert(u7.getAs[Double]("total_value") == 3.0)
    assert(!u7.getAs[Boolean]("closed"))
    assert(rows.exists(_.getAs[Long]("user_id") == 8L))
  }

  test("upsertStream merges micro-batches by key (MoR) exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.ice._, graft.ice.catalog._, graft.ice.types.SparkConv

    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("id", "payload")
    val cat = new DirCatalog(java.nio.file.Files.createTempDirectory("whu").toString)
    val t = IceTable.create(cat, TableIdentifier.parse("db.upsert"),
      SparkConv.fromSpark(stream.schema))
    t.append(spark).appendDataFrame(Seq((1L, "stale"), (2L, "stale")).toDF("id", "payload"))
    val ckpt = java.nio.file.Files.createTempDirectory("uckpt").toString

    input.addData((1L, "fresh"), (3L, "new"))
    val q1 = StreamOps.upsertStream(stream, t, Seq("id"), ckpt)
    assert(q1.awaitTermination(120000), "upsert query did not finish in time")
    t.refresh()
    val rows = t.newScan().toDF(spark).as[(Long, String)].collect().toMap
    assert(rows == Map(1L -> "fresh", 2L -> "stale", 3L -> "new"))
    // matched rows were superseded by position deletes, not rewritten:
    // the original data file survives and a delete file exists
    assert(t.planDeleteEntries(t.currentSnapshot.get)
      .exists(_.dataFile.content == graft.ice.manifest.FileContent.PositionDeletes))

    // restart from the same checkpoint: a later batch updates key 3;
    // the first batch is NOT replayed (its marker advanced)
    input.addData((3L, "newer"))
    val q2 = StreamOps.upsertStream(stream, t, Seq("id"), ckpt)
    assert(q2.awaitTermination(120000), "restarted upsert did not finish in time")
    t.refresh()
    val rows2 = t.newScan().toDF(spark).as[(Long, String)].collect().toMap
    assert(rows2 == Map(1L -> "fresh", 2L -> "stale", 3L -> "newer"))
  }

  test("appendStream ingests micro-batches into the table exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.ice._, graft.ice.catalog._, graft.ice.types.SparkConv

    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("id", "payload")
    val cat = new DirCatalog(java.nio.file.Files.createTempDirectory("whs").toString)
    val t = IceTable.create(cat, TableIdentifier.parse("db.ingest"),
      SparkConv.fromSpark(stream.schema))
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString

    def lastBatch(): Map[String, Long] = t.metadata.properties
      .collect { case (k, v) if k.startsWith(StreamOps.LastBatchIdPropPrefix) =>
        k -> v.toLong }

    input.addData((1L, "a"), (2L, "b"))
    val q1 = StreamOps.appendStream(stream, t, ckpt)
    assert(q1.awaitTermination(120000), "ingest query did not finish in time")
    t.refresh()
    assert(t.newScan().toDF(spark).count() == 2)
    val marks1 = lastBatch()
    assert(marks1.size == 1)

    // restart from the same checkpoint with more data: only NEW rows
    // land, and the SAME query-scoped property advances (the query id is
    // persisted in the checkpoint)
    input.addData((3L, "c"))
    val q2 = StreamOps.appendStream(stream, t, ckpt)
    assert(q2.awaitTermination(120000), "restarted ingest did not finish in time")
    t.refresh()
    assert(t.newScan().toDF(spark).count() == 3)
    val marks2 = lastBatch()
    assert(marks2.size == 1 && marks2.keySet == marks1.keySet)
    assert(marks2.head._2 > marks1.head._2)

    // a FRESH checkpoint means a fresh query id: its batch 0 must NOT be
    // swallowed by the old query's marker
    input.addData((4L, "d"))
    val ckpt2 = java.nio.file.Files.createTempDirectory("ckpt2").toString
    val q3 = StreamOps.appendStream(stream, t, ckpt2)
    assert(q3.awaitTermination(120000), "fresh-checkpoint ingest did not finish in time")
    t.refresh()
    // the new query starts at batch 0 — with the OLD un-scoped marker
    // (last id 1 >= 0) its first batch would be silently swallowed.
    // Prove it landed: the new row is present and the new query wrote
    // its OWN marker (exactly-once holds per query; replay volume from
    // MemoryStream depends on its commit trimming, so don't pin it)
    assert(t.newScan().toDF(spark).filter(col("id") === 4L).count() >= 1)
    assert(t.newScan().toDF(spark).count() >= 4)
    assert(lastBatch().size == 2)
  }

  test("stream-stream interval join emits exactly the batch pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Long)]
    def df = input.toDF().toDF("event_id", "ts", "user_id")
    // user 1: events at 0, 10, 40 min -> pairs (1,2) only within 15 min;
    // user 2: events at 0, 12 -> pair (4,5)
    input.addData(
      (1L, ts(0), 1L), (2L, ts(10), 1L), (3L, ts(40), 1L),
      (4L, ts(0), 2L), (5L, ts(12), 2L))
    val joined = StreamOps.intervalJoin(df, df, "user_id", 15)
      .select(col("l.event_id").as("e1"), col("r.event_id").as("e2"))
    val out = StreamOps.runToMemory(spark, joined, "ivj_test")
    val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (4L, 5L)), pairs.toString)
  }

  test("streaming dedup within watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val events = input.toDF().toDF("ts", "event_id")
    input.addData((ts(0), 1L), (ts(1), 1L), (ts(2), 2L))
    val out = StreamOps.runToMemory(spark,
      StreamOps.streamingDedup(events, Seq("event_id")), "dedup_test")
    assert(out.select("event_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("micro-batch stream parses table metadata at most once per version") {
    import graft.ice._, graft.ice.catalog._, graft.ice.types.SparkConv
    import graft.streaming.{GraftMicroBatchStream, GraftTableStream}
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val wh = java.nio.file.Files.createTempDirectory("whmemo").toString
    val cat = new DirCatalog(wh)
    val raw = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    val t = IceTable.create(cat, TableIdentifier.parse("db.memo"),
      SparkConv.fromSpark(raw.schema))
    t.append(spark).appendDataFrame(raw.limit(100))
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("warehouse", wh, "table", "db.memo"))
    val stream = new GraftMicroBatchStream(
      GraftTableStream.plainSchema(t), opts)
    // one micro-batch drives several stream-method calls; each used to
    // re-parse the metadata JSON — now all share one version-keyed parse
    val o0 = stream.initialOffset()
    val o1 = stream.latestOffset(o0, ReadLimit.allAvailable())
    stream.reportLatestOffset()
    stream.planInputPartitions(o0, o1)
    assert(stream.metadataLoads <= 1L,
      s"expected <=1 metadata parse per version, got ${stream.metadataLoads}")
    // a new commit bumps the version: exactly one more parse, and the
    // new snapshot is visible (freshness preserved)
    t.append(spark).appendDataFrame(raw.limit(50))
    val o2 = stream.latestOffset(o1, ReadLimit.allAvailable())
    assert(o2 != o1, "new commit must be visible through the memo")
    stream.planInputPartitions(o1, o2)
    stream.reportLatestOffset()
    assert(stream.metadataLoads <= 2L,
      s"expected <=2 parses across two versions, got ${stream.metadataLoads}")
  }

  test("graft-table streaming source: snapshot-aligned batches, resume, non-append refusal") {
    import graft.ice._, graft.ice.catalog._, graft.ice.types.SparkConv
    val wh = java.nio.file.Files.createTempDirectory("whsrc").toString
    val cat = new DirCatalog(wh)
    val raw = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val t = IceTable.create(cat, TableIdentifier.parse("db.follow"),
      SparkConv.fromSpark(raw.schema))
    t.append(spark).appendDataFrame(raw.filter("o_orderkey % 3 = 0"))
    t.append(spark).appendDataFrame(raw.filter("o_orderkey % 3 = 1"))

    val out = java.nio.file.Files.createTempDirectory("srcout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("srcckpt").toString
    def runAvailable(): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("warehouse", wh).option("table", "db.follow").load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runAvailable()
    val firstTwo = raw.filter("o_orderkey % 3 < 2")
    assert(spark.read.parquet(out).count() == firstTwo.count())

    // a third append streams incrementally on resume from the checkpoint:
    // only the new snapshot's rows arrive
    t.append(spark).appendDataFrame(raw.filter("o_orderkey % 3 = 2"))
    runAvailable()
    val got = spark.read.parquet(out)
    assert(got.count() == raw.count())
    val a = got.agg(sum("o_totalprice")).head.getDouble(0)
    val b = raw.agg(sum("o_totalprice")).head.getDouble(0)
    assert(math.abs(a - b) < 1e-6)

    // a delete snapshot poisons the stream by default...
    t.delete(spark).deleteWherePositional(
      graft.ice.expr.Expr.lt("o_orderkey", graft.ice.types.Literal.long(100)))
    val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runAvailable()
    }
    assert(failed.getMessage.contains("non-append") ||
      Option(failed.getCause).exists(_.getMessage.contains("non-append")))

    // ...and skip-non-append-snapshots streams past it (delete rows are
    // simply not re-emitted; a fourth append still arrives)
    t.append(spark).appendDataFrame(raw.limit(10))
    val q2 = spark.readStream.format("graft-table")
      .option("warehouse", wh).option("table", "db.follow")
      .option("skip-non-append-snapshots", "true").load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    assert(spark.read.parquet(out).count() == raw.count() + 10)
  }

  test("graft-table mode=cdc streams changelog rows and resumes incrementally") {
    import graft.ice._, graft.ice.catalog._, graft.ice.types.SparkConv
    val wh = java.nio.file.Files.createTempDirectory("whcdc").toString
    val cat = new DirCatalog(wh)
    val raw = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val t = IceTable.create(cat, TableIdentifier.parse("db.cdcsrc"),
      SparkConv.fromSpark(raw.schema))
    t.append(spark).appendDataFrame(raw)

    val out = java.nio.file.Files.createTempDirectory("cdcout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cdcckpt").toString
    def drain(): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("warehouse", wh).option("table", "db.cdcsrc")
        .option("mode", "cdc").load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    val got1 = spark.read.parquet(out)
    assert(got1.columns.toSeq.takeRight(3) ==
      Seq("_change_type", "_commit_snapshot_id", "_change_ordinal"))
    assert(got1.count() == raw.count())
    assert(got1.filter(col("_change_type") =!= "insert").count() == 0)

    // a DELETE commit streams as delete rows on resume — the case the
    // append-mode source must refuse is exactly what cdc mode carries
    t.delete(spark).deleteWherePositional(
      graft.ice.expr.Expr.lt("o_orderkey", graft.ice.types.Literal.long(100)))
    drain()
    val got2 = spark.read.parquet(out)
    val expectDel = raw.filter("o_orderkey < 100").count()
    assert(got2.filter(col("_change_type") === "delete").count() == expectDel)
    // the incremental batch matches planChanges over the same range
    val snaps = IceTable.load(cat, TableIdentifier.parse("db.cdcsrc"))
      .snapshots.sortBy(_.sequenceNumber)
    val batch = t.planChanges(spark, snaps.head.snapshotId, snaps.last.snapshotId)
    assert(got2.filter(col("_change_type") === "delete")
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq ==
      batch.filter(col("_change_type") === "delete")
        .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq)
    // committed batches clean their staging (no leaked _cdc_staging dirs)
    val staging = new java.io.File(
      s"$wh/db/cdcsrc/_cdc_staging")
    assert(!staging.exists() || staging.listFiles().isEmpty,
      s"staging dirs leaked: ${Option(staging.listFiles()).map(_.toSeq).getOrElse(Nil)}")
  }

  test("mode=cdc staging rides Hadoop FileSystem: file:-scheme location, stale sweep") {
    import graft.ice._, graft.ice.catalog._, graft.ice.types.SparkConv
    val wh = java.nio.file.Files.createTempDirectory("whcdcfs").toString
    val cat = new DirCatalog(wh)
    val raw = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val t = IceTable.create(cat, TableIdentifier.parse("db.plain"),
      SparkConv.fromSpark(raw.schema))
    t.append(spark).appendDataFrame(raw)
    t.delete(spark).deleteWherePositional(
      graft.ice.expr.Expr.lt("o_orderkey", graft.ice.types.Literal.long(50)))

    // re-register the SAME table under a file:-scheme location — the
    // staging plane must resolve it through Hadoop FileSystem (java.io
    // .File cannot take a URI; with the old code this drained ZERO rows)
    val plainIdent = TableIdentifier.parse("db.plain")
    val plainLoc = IceTable.load(cat, plainIdent).metadata.location
    val m = graft.ice.meta.TableMetadataIO.read(cat.metadataLocation(plainIdent).get)
    val schemed = java.nio.file.Files.createTempFile("cdcfs", ".metadata.json")
    graft.ice.meta.TableMetadataIO.write(schemed.toString,
      m.copy(location = s"file:$plainLoc"))
    cat.registerTable(TableIdentifier.parse("db.schemed"), schemed.toString)

    // pre-plant staging leftovers: an OLD entry (crash leftover) must be
    // swept at stream start; a FRESH one (a concurrent stream's in-flight
    // batch) must survive both the sweep and commit-time drains
    val stagingRoot = new java.io.File(s"$plainLoc/_cdc_staging")
    val stale = new java.io.File(stagingRoot, "1_2_stale-crash-leftover")
    val fresh = new java.io.File(stagingRoot, "3_4_concurrent-in-flight")
    assert(stale.mkdirs() && fresh.mkdirs())
    assert(stale.setLastModified(
      System.currentTimeMillis() - 20L * 60 * 1000))

    val out = java.nio.file.Files.createTempDirectory("cdcfsout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cdcfsckpt").toString
    val q = spark.readStream.format("graft-table")
      .option("warehouse", wh).option("table", "db.schemed")
      .option("mode", "cdc").load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.read.parquet(out)
    val expectDel = raw.filter("o_orderkey < 50").count()
    assert(got.filter(col("_change_type") === "insert").count() == raw.count(),
      "file:-scheme staging must serve the full insert batch, not zero rows")
    assert(got.filter(col("_change_type") === "delete").count() == expectDel)
    // stale leftover swept, concurrent stream's dir untouched, own drained
    val left = Option(stagingRoot.listFiles()).map(_.map(_.getName).toSet).getOrElse(Set.empty)
    assert(!left.contains(stale.getName), "crash leftover not swept at stream start")
    assert(left.contains(fresh.getName), "concurrent stream's fresh staging was clobbered")
    assert(left == Set(fresh.getName), s"own staging dirs leaked: ${left - fresh.getName}")
  }

  test("graft-table source from-timestamp starts after the mark") {
    import graft.ice._, graft.ice.catalog._, graft.ice.types.SparkConv
    val wh = java.nio.file.Files.createTempDirectory("whts").toString
    val cat = new DirCatalog(wh)
    val raw = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    val t = IceTable.create(cat, TableIdentifier.parse("db.fromts"),
      SparkConv.fromSpark(raw.schema))
    t.append(spark).appendDataFrame(raw.filter("o_orderkey % 2 = 0"))
    val mark = t.currentSnapshot.get.timestampMs
    Thread.sleep(5) // the second commit must be strictly younger
    t.append(spark).appendDataFrame(raw.filter("o_orderkey % 2 = 1"))

    val out = java.nio.file.Files.createTempDirectory("tsout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("tsckpt").toString
    val q = spark.readStream.format("graft-table")
      .option("warehouse", wh).option("table", "db.fromts")
      .option("from-timestamp", mark.toString).load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // only the post-mark snapshot's rows replay
    assert(spark.read.parquet(out).count() ==
      raw.filter("o_orderkey % 2 = 1").count())

    // a timestamp before the first snapshot replays everything
    val out2 = java.nio.file.Files.createTempDirectory("tsout2").toString
    val ckpt2 = java.nio.file.Files.createTempDirectory("tsckpt2").toString
    val q2 = spark.readStream.format("graft-table")
      .option("warehouse", wh).option("table", "db.fromts")
      .option("from-timestamp", "0").load()
      .writeStream.format("parquet")
      .option("path", out2).option("checkpointLocation", ckpt2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    assert(spark.read.parquet(out2).count() == raw.count())
  }

  test("graft-table source admission control: max-files/max-rows per trigger") {
    import graft.ice._, graft.ice.catalog._, graft.ice.types.SparkConv
    val wh = java.nio.file.Files.createTempDirectory("whadm").toString
    val cat = new DirCatalog(wh)
    val raw = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    val t = IceTable.create(cat, TableIdentifier.parse("db.paced"),
      SparkConv.fromSpark(raw.schema))
    // four snapshots, one file each (repartition(1)), known row counts
    (0 until 4).foreach(i =>
      t.append(spark).appendDataFrame(
        raw.filter(s"o_orderkey % 4 = $i").repartition(1)))

    def drain(extra: Map[String, String]): Seq[Long] = {
      val out = java.nio.file.Files.createTempDirectory("admout").toString
      val ckpt = java.nio.file.Files.createTempDirectory("admck").toString
      var reader = spark.readStream.format("graft-table")
        .option("warehouse", wh).option("table", "db.paced")
      extra.foreach { case (k, v) => reader = reader.option(k, v) }
      val q = reader.load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val batches = q.recentProgress.toSeq.map(_.numInputRows).filter(_ > 0)
      assert(spark.read.parquet(out).count() == raw.count(),
        "every pacing mode must still drain the whole table")
      batches
    }

    // unlimited: AvailableNow takes everything in one batch
    assert(drain(Map.empty).size == 1)
    // one file per trigger = one snapshot per batch here: four batches
    val perFile = drain(Map("max-files-per-trigger" -> "1"))
    assert(perFile.size == 4, s"expected 4 single-file batches, got $perFile")
    // a row cap spanning ~2 snapshots: batches obey the cap save the
    // at-least-one-snapshot floor
    val cap = (raw.count() / 2 + 1).toString
    val perRows = drain(Map("max-rows-per-trigger" -> cap))
    assert(perRows.size >= 2, s"row cap must split the drain, got $perRows")
    assert(perRows.forall(_ <= cap.toLong), s"no batch may exceed the cap: $perRows")
  }

  test("mode=cdc admission control prices delete churn, not just appends") {
    import graft.ice._, graft.ice.catalog._, graft.ice.types.SparkConv
    val wh = java.nio.file.Files.createTempDirectory("whcdcadm").toString
    val cat = new DirCatalog(wh)
    val raw = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_totalprice").limit(100).repartition(1)
    val t = IceTable.create(cat, TableIdentifier.parse("db.churn"),
      SparkConv.fromSpark(raw.schema))
    t.append(spark).appendDataFrame(raw)
    val keys = raw.select("o_orderkey").collect().map(_.getLong(0)).sorted
    // MoR positional delete of 40 rows: ADDS ~0 data rows but plans a
    // 40-row changelog batch — append pricing sees it as free
    t.delete(spark).deleteWherePositional(
      graft.ice.expr.Expr.lt("o_orderkey", graft.ice.types.Literal.long(keys(40))))
    val snap = IceTable.load(cat, TableIdentifier.parse("db.churn")).currentSnapshot.get
    assert(snap.summary("added-delete-records") == "40",
      s"delete churn must be in the summary: ${snap.summary}")

    def drain(extra: Map[String, String]): Seq[Long] = {
      val out = java.nio.file.Files.createTempDirectory("churnout").toString
      val ckpt = java.nio.file.Files.createTempDirectory("churnck").toString
      var reader = spark.readStream.format("graft-table")
        .option("warehouse", wh).option("table", "db.churn").option("mode", "cdc")
      extra.foreach { case (k, v) => reader = reader.option(k, v) }
      val q = reader.load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val got = spark.read.parquet(out)
      assert(got.filter(col("_change_type") === "insert").count() == 100)
      assert(got.filter(col("_change_type") === "delete").count() == 40)
      q.recentProgress.toSeq.map(_.numInputRows).filter(_ > 0)
    }

    // churn pricing: 100 insert rows + 40 delete-churn rows > 110 cap →
    // the delete commit lands in its own batch (append pricing would
    // price it at zero and take both snapshots in one batch)
    assert(drain(Map("max-rows-per-trigger" -> "110")).size == 2,
      "a delete-heavy commit must be priced by its churn")
    assert(drain(Map.empty).size == 1) // fresh checkpoint dir per drain
  }
}

class CodegenExprSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  test("codegen bucket expression matches spec vectors and driver-side apply") {
    import spark.implicits._
    import graft.ice.transform._
    import graft.ice.types._
    // spec vectors (transform_test.cc): int 34 -> 3, string iceberg -> 1
    val df = Seq((34L, "iceberg")).toDF("l", "s")
    val row = df.select(
      BucketTransform(4).toColumn(col("l"), LongT).as("bl"),
      BucketTransform(4).toColumn(col("s"), StringT).as("bs")).head
    assert(row.getInt(0) == 3)
    assert(row.getInt(1) == 1)
    // stays in whole-stage codegen (no UDF / CodegenFallback node)
    val plan = df.select(BucketTransform(8).toColumn(col("l"), LongT))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
    // and the generated Java actually COMPILES — with fallback disabled a
    // Janino error (e.g. a bad static-call spelling) surfaces instead of
    // silently degrading the whole stage to interpreted execution
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = spark.range(100)
        .select(BucketTransform(8).toColumn(col("id"), LongT).as("b"))
        .groupBy("b").count().count()
      assert(n == 8)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
    // distributed vs driver agreement over a range of values
    val vals = spark.range(1000).select(col("id"))
    val got = vals.select(col("id"),
      BucketTransform(16).toColumn(col("id"), LongT).as("b")).collect()
    got.foreach { r =>
      assert(BucketTransform(16)(r.getLong(0), LongT) == r.getInt(1))
    }
  }

  test("codegen truncate expression: decimal/binary spec vectors, no UDF") {
    import spark.implicits._
    import graft.ice.transform._
    import graft.ice.types._
    // transform_test.cc truncate vectors: decimal 123.45 w=50 -> 123.00,
    // binary [1,2,3,4,5] w=3 -> [1,2,3]; negative unscaled floors toward
    // negative infinity: -0.05 w=50 -> -0.50
    val df = Seq(
      (new JBigDecimal("123.45"), Array[Byte](1, 2, 3, 4, 5)),
      (new JBigDecimal("-0.05"), Array[Byte](7, 8)))
      .toDF("d", "b")
      .select(col("d").cast("decimal(5,2)").as("d"), col("b"))
    val rows = df.select(
      TruncateTransform(50).toColumn(col("d"), DecimalT(5, 2)).as("td"),
      TruncateTransform(3).toColumn(col("b"), BinaryT).as("tb")).collect()
    assert(rows(0).getDecimal(0).compareTo(new JBigDecimal("123.00")) == 0)
    assert(rows(0).getAs[Array[Byte]](1).toSeq == Seq[Byte](1, 2, 3))
    assert(rows(1).getDecimal(0).compareTo(new JBigDecimal("-0.50")) == 0)
    assert(rows(1).getAs[Array[Byte]](1).toSeq == Seq[Byte](7, 8))
    // null-safe
    val nulls = Seq((null: JBigDecimal, null: Array[Byte])).toDF("d", "b")
      .select(col("d").cast("decimal(5,2)").as("d"), col("b"))
      .select(
        TruncateTransform(10).toColumn(col("d"), DecimalT(5, 2)).as("td"),
        TruncateTransform(2).toColumn(col("b"), BinaryT).as("tb")).head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
    // no UDF in the plan, and the generated Java compiles with fallback off
    val plan = df.select(
      TruncateTransform(50).toColumn(col("d"), DecimalT(5, 2)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = df.select(
        TruncateTransform(50).toColumn(col("d"), DecimalT(5, 2)).as("td"),
        TruncateTransform(3).toColumn(col("b"), BinaryT).as("tb")).count()
      assert(n == 2)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
    // distributed vs driver agreement
    val vals = spark.range(500)
      .select((col("id") - 250).cast("decimal(10,2)").as("d"))
    vals.select(col("d"),
      TruncateTransform(7).toColumn(col("d"), DecimalT(10, 2)).as("td"))
      .collect().foreach { r =>
        val expect = TruncateTransform(7)(r.getDecimal(0), DecimalT(10, 2))
          .asInstanceOf[JBigDecimal]
        assert(r.getDecimal(1).compareTo(expect) == 0, s"${r.getDecimal(0)}")
      }
  }

  test("scan limit truncates the planned file list") {
    import graft.ice._, graft.ice.catalog._, graft.ice.types._
    val cat = new DirCatalog(java.nio.file.Files.createTempDirectory("whl").toString)
    val raw = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val t = IceTable.create(cat, TableIdentifier.parse("db.lim"),
      SparkConv.fromSpark(raw.schema))
    // 3 separate appends -> >= 3 files
    t.append(spark).appendDataFrame(raw.limit(100))
    t.append(spark).appendDataFrame(raw.limit(100))
    t.append(spark).appendDataFrame(raw.limit(100))
    val all = t.newScan().planFiles()
    assert(all.size >= 3)
    val limited = t.newScan().limit(50)
    assert(limited.planFiles().size == 1) // first file already covers 50 rows
    assert(limited.toDF(spark).count() == 50)
  }

}
