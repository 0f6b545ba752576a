package org.apache.spark.sql

import java.io.OutputStream

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.execution.arrow.{ArrowBatchStreamWriter, ArrowConverters}
import org.apache.spark.sql.types.StructType

/** Access bridge to Spark's sql-private Arrow conversion machinery
  * (Dataset.toArrowBatchRdd / ArrowBatchStreamWriter are private[sql]).
  * Same pattern as GraftColumnBridge. */
object GraftArrowBridge {

  /** Serialized Arrow record batches (IPC RecordBatch messages, no
    * stream framing), one element per produced batch, computed on
    * EXECUTORS — the distributed half of an Arrow export. */
  def toBatchRdd(df: DataFrame): RDD[Array[Byte]] =
    df.asInstanceOf[classic.Dataset[Row]].toArrowBatchRdd

  /** Frame schema + batches as one complete Arrow IPC stream on `out`. */
  def writeIpcStream(schema: StructType, timeZoneId: String,
      batches: Iterator[Array[Byte]], out: OutputStream): Unit = {
    val w = new ArrowBatchStreamWriter(schema, out, timeZoneId,
      false, true)
    w.writeBatches(batches)
    w.end()
  }

  /** Rebuild a DataFrame from serialized Arrow batches (the read side of
    * the interop path; ArrowConverters.toDataFrame). */
  def fromBatches(spark: SparkSession, schemaJson: String,
      batches: Iterator[Array[Byte]]): DataFrame =
    ArrowConverters.toDataFrame(batches, schemaJson,
      spark.asInstanceOf[classic.SparkSession])
}
