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

  /** Distributed Arrow IPC export: every TASK frames its partition's
    * batches as one complete .arrows stream file (schema header +
    * batches + EOS) written directly from the executor — the driver sees
    * only (path, batchCount) pairs, never a byte of data. The per-task
    * files are independently consumable (pyarrow/DuckDB read each one),
    * which is the cluster-scale fan-out shape the single-stream
    * `writeIpcStream` deliberately is not. Empty partitions write no
    * file. */
  def writeIpcFiles(df: DataFrame, outDir: String): Seq[(String, Long)] = {
    val schema = df.schema
    val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sessionState.newHadoopConf())
    toBatchRdd(df).mapPartitionsWithIndex { (i, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val path = new org.apache.hadoop.fs.Path(outDir, f"part-$i%05d.arrows")
        val fs = path.getFileSystem(conf.value)
        val out = fs.create(path, true)
        var n = 0L
        try {
          val w = new ArrowBatchStreamWriter(schema, out, tz, false, true)
          w.writeBatches(it.map { b => n += 1; b })
          w.end()
        } finally out.close()
        Iterator.single((path.toString, n))
      }
    }.collect().toSeq.sortBy(_._1)
  }

  /** Rebuild a DataFrame from serialized Arrow batches (the read side of
    * the interop path; ArrowConverters.toDataFrame). */
  def fromBatches(spark: SparkSession, schemaJson: String,
      batches: Iterator[Array[Byte]]): DataFrame =
    ArrowConverters.toDataFrame(batches, schemaJson,
      spark.asInstanceOf[classic.SparkSession])
}
