package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (the reference has no streaming at all —
  * SURVEY §2.9; these are the Spark-native stream forms of the Events
  * batch operators, sharing their semantics).
  *
  * Scale shape: watermarks bound state; session state is per-key and
  * O(active sessions); both aggregations shuffle once on their keys —
  * identical plan shape on a 1000-executor cluster. */
object StreamOps {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)

  final case class SessionUpdate(user_id: Long, session_start: java.sql.Timestamp,
      n_events: Long, total_value: Double, closed: Boolean)

  final case class SessionState(start: Long, lastTs: Long,
      n: Long, total: Double)

  /** Watermarked tumbling-window counts — the canonical streaming agg
    * (readStream -> withWatermark -> window -> agg). */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Declarative session windows (session_window with a gap). */
  def sessionWindows(events: DataFrame, gapMinutes: Int = 30,
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  /** Custom per-key state: sessionization via mapGroupsWithState — the
    * KeyValueGroupedDataset state API the north-star asks for. Emits the
    * running session per user.
    *
    * Timeout mode matters for the trigger: under `Trigger.AvailableNow`
    * a ProcessingTimeTimeout keeps the query scheduling batches until the
    * wall-clock timeout fires, so a finite replay never terminates — use
    * the default `NoTimeout` there (the final-state query doesn't need
    * timeout-closed sessions). Pass `ProcessingTimeTimeout` for a real
    * continuous stream where idle sessions must be emitted as closed. */
  def sessionizeWithState(events: Dataset[Event], gapMinutes: Int = 30,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    val timed = timeout != GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionUpdate](timeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            SessionUpdate(userId, new java.sql.Timestamp(s.start), s.n, s.total, closed = true)
          } else {
            val events = batch.toSeq.sortBy(_.ts.getTime)
            var s = state.getOption.getOrElse(
              SessionState(events.head.ts.getTime, events.head.ts.getTime, 0L, 0.0))
            for (e <- events) {
              s =
                if (e.ts.getTime - s.lastTs > gapMs)
                  SessionState(e.ts.getTime, e.ts.getTime, 1L, e.value) // new session
                else s.copy(lastTs = e.ts.getTime, n = s.n + 1, total = s.total + e.value)
            }
            state.update(s)
            if (timed) state.setTimeoutDuration(gapMs)
            SessionUpdate(userId, new java.sql.Timestamp(s.start), s.n, s.total, closed = false)
          }
      }
  }

  /** Stream-stream INNER interval join: (left, right) pairs sharing a key
    * with right.ts in (left.ts, left.ts + within]. Inner matches emit as
    * soon as both sides have arrived — no watermark closure gates
    * emission — while the watermarks bound each side's buffered state to
    * the join window plus the lateness allowance, which is what makes a
    * stream-stream join viable on an unbounded stream (state is
    * O(events in window), not O(stream)). */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      withinMinutes: Int, watermark: String = "2 hours"): DataFrame = {
    val l = left.withWatermark("ts", watermark).alias("l")
    val r = right.withWatermark("ts", watermark).alias("r")
    l.join(r, expr(
      s"l.$key = r.$key AND r.ts > l.ts AND r.ts <= l.ts + interval $withinMinutes minutes"))
  }

  /** Streaming exact dedup on a key with watermarked state
    * (dropDuplicates over a stream — the training-pipeline ingest gate). */
  def streamingDedup(events: DataFrame, keyCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Run `f` with `spark.sql.shuffle.partitions` sized from the input's
    * scan-split count, restoring the session value afterwards (the r18
    * generalization of what the interval join already did). A stateful
    * streaming operator instantiates state-store instances PER SHUFFLE
    * PARTITION (a stream-stream join: four per partition), each with
    * fixed maintenance/commit cost per micro-batch — on a small input
    * that fixed cost dominates the whole query. The input's split count
    * grows with data volume, and the session default CAPS the result,
    * so a cluster-sized session on a big input keeps its own configured
    * parallelism; only genuinely small inputs narrow. The partition
    * count never changes a keyed operator's RESULT — only where each
    * key's state lives. */
  def withInputSizedShuffle[T](s: org.apache.spark.sql.SparkSession,
      inputParts: Int)(f: => T): T = {
    // A/B escape hatch (perf-experiment harness, like SPARK_GRAFT_D9_PASSES)
    if (sys.env.contains("SPARK_GRAFT_NO_INPUT_SIZED_STATE")) return f
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    val parts = math.max(1, math.min(inputParts, prev.toInt))
    s.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try f finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Streaming ingest INTO an Iceberg-format table: each micro-batch
    * appends through a Transaction that also records the batch id in the
    * table properties, so the append and the progress marker commit in
    * ONE atomic version bump. On restart after a crash, foreachBatch may
    * replay the last batch — the recorded id makes the replay a no-op,
    * giving exactly-once table contents from Spark's at-least-once
    * replay (the standard transactional-sink idempotence pattern).
    *
    * Scale shape: the micro-batch append is the same distributed write
    * path as batch appends (partition clustering, footer metrics); state
    * here is ONE table property, not per-row bookkeeping. */
  val LastBatchIdPropPrefix = "graft.stream.last-batch-id"

  /** Idempotence property for one streaming query: batch ids restart at 0
    * for every new checkpoint, so the marker must be scoped by the query
    * id (stable across restarts FROM THE SAME checkpoint — the standard
    * (queryId, epochId) transactional-sink key). A second, fresh-
    * checkpoint stream into the same table gets its own property and is
    * never silently skipped. */
  def lastBatchIdProp(queryId: String): String =
    s"$LastBatchIdPropPrefix.$queryId"

  def appendStream(stream: DataFrame, table: graft.ice.IceTable,
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow()): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Spark sets the owning query's id as a local property on the
        // micro-batch thread; it is persisted in the checkpoint, so a
        // restart reuses it and a new checkpoint gets a fresh one
        val queryId = Option(batch.sparkSession.sparkContext
          .getLocalProperty("sql.streaming.queryId")).getOrElse("default")
        val prop = lastBatchIdProp(queryId)
        table.refresh()
        val done = table.metadata.properties.get(prop).map(_.toLong)
        if (!done.exists(_ >= batchId)) {
          table.newTransaction(batch.sparkSession)
            .append(batch)
            .setProperty(prop, batchId.toString)
            .commitTransaction()
        }
        ()
      }
      .start()

  /** Streaming upsert (the CDC-ingest shape): each micro-batch MERGEs
    * into the table keyed by `on`, merge-on-read — a batch writes
    * keys-sized position-delete files plus the new row versions, never
    * rewriting data files in the hot path (compaction folds the deletes
    * back in off the hot path). Exactly-once: the (queryId, batchId)
    * marker commits INSIDE the merge's atomic overwrite snapshot, same
    * discipline as appendStream — a replayed batch is skipped and a
    * half-applied batch cannot exist. Each batch must carry unique `on`
    * keys (ANSI MERGE cardinality; MergeInto enforces it). */
  def upsertStream(stream: DataFrame, table: graft.ice.IceTable, on: Seq[String],
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow()): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val queryId = Option(batch.sparkSession.sparkContext
          .getLocalProperty("sql.streaming.queryId")).getOrElse("default")
        val prop = lastBatchIdProp(queryId)
        table.refresh()
        val done = table.metadata.properties.get(prop).map(_.toLong)
        if (!done.exists(_ >= batchId)) {
          table.merge(batch.sparkSession, batch, on)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .withMergeOnRead()
            .withProperty(prop, batchId.toString)
            .commit()
        }
        ()
      }
      .start()

  /** Wire a streaming DataFrame to an in-memory sink and process all
    * currently-available data (test/demo harness). */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
      outputMode: OutputMode = OutputMode.Append): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    spark.table(name)
  }

  /** Drain a streaming query into parquet files via foreachBatch and
    * read the result back as a DISTRIBUTED DataFrame.
    *
    * This replaces the memory sink for the driver-facing harness
    * queries: a memory sink collects every result row into the driver
    * and hands consumers a LocalRelation whose rows are serialized into
    * EVERY downstream task closure. At 10x bench scale one streaming
    * result reached ~16 MB per task and the task-serialization OOM
    * killed the scheduler backend (wedging all later jobs). foreachBatch
    * keeps each batch a distributed write: Complete mode overwrites with
    * the latest full result, Append/Update modes accumulate emitted
    * rows — the same rows the memory sink would have collected. */
  def runToParquet(spark: SparkSession, df: DataFrame,
      outputMode: OutputMode = OutputMode.Append): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("st_sink").toString + "/out"
    val complete = outputMode == OutputMode.Complete()
    val q = df.writeStream
      .outputMode(outputMode)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.mode(if (complete) "overwrite" else "append").parquet(dir)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(dir)))
      spark.read.schema(df.schema).parquet(dir)
    else // a stream that emitted nothing never created the sink dir
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], df.schema)
  }
}
