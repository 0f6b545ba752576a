package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream-shaped operators over the `events` table (the reference
  * has no streaming — SURVEY §2.9 — these are the Spark-native batch
  * equivalents; the same transforms run under Structured Streaming by
  * swapping read for readStream + watermark). */
object Events {

  /** `ts` has shipped in two physical shapes across testdata
    * generations: parquet TIMESTAMP(NANOS) — which Spark 4 reads only
    * as a long under `nanosAsLong` — and plain TIMESTAMP(MICROS).
    * Normalize either to a session-TZ timestamp so every consumer
    * (and the DuckDB oracle, which reads the file natively) sees the
    * same instants. */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType =>
      // `ts div 1000`, NOT `ts / 1000`: epoch-ns values exceed 2^53, so
      // the double division `/` loses microseconds
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case _ => df.withColumn("ts", col("ts").cast("timestamp"))
  }

  def load(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(s"$sfDir/events.parquet"))
  }

  /** Sessionization: a new session starts after `gapMinutes` of
    * inactivity per user. Batch form of the classic
    * mapGroupsWithState session-window; one shuffle on user_id. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    // event_id tie-break: events share timestamps, and a ROWS-framed
    // running sum over an ambiguous order is engine-dependent
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapMinutes * 60L, 1)
          .otherwise(0))
      .withColumn("session_seq", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("prev_ts", "new_session")
  }

  /** Per-session rollup: counts, duration, value. */
  def sessionStats(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy("user_id", "session_seq")
      .agg(
        count(lit(1)).as("n_events"),
        (unix_timestamp(max("ts")) - unix_timestamp(min("ts"))).as("duration_s"),
        sum("value").as("total_value"))

  /** Tumbling-window aggregation (the watermarked streaming agg, batch
    * form): events per type per hour. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events.groupBy(
      window(col("ts"), "1 hour").getField("start").as("hour_start"),
      col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
}
