package graft.ice.connector

import java.util.UUID

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, NullOrdering, SortDirection, SortOrder => V2SortOrder}
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, SupportsDynamicOverwrite, SupportsOverwrite, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.sources.{AlwaysTrue, Filter => V1Filter}
import org.apache.spark.sql.types._

import graft.ice.IceTable
import graft.ice.expr.{Binder, Bound, BAnd, BNot, BOr, BPred, BRaw, Expr => IceExpr, InclusiveProjection, PartitionTupleEvaluator}
import graft.ice.manifest.{DataFile, FileContent, ManifestEntry, ManifestStatus}
import graft.ice.meta.{DataOperation, PartitionSpec, TableProperties}
import graft.ice.transform.IdentityTransform
import graft.ice.types.{IcePrimitive, Schema, SparkConv}
import graft.ice.write.{Metrics, PartitionPaths, SnapshotProducer}

/** Native DataSourceV2 write path (replaces the former `V1Write`
  * fallback).
  *
  * Why a bespoke `BatchWrite` when the V1 shim already wrote files from
  * executors: two things only this contract can express.
  *
  *  - **The TABLE declares its write shape.** `RequiresDistributionAndOrdering`
  *    hands Catalyst the partition transforms as a clustered
  *    distribution plus the table sort order as required ordering, so
  *    the shuffle that co-locates rows per partition is planned by
  *    Spark (AQE-sized, coalescible) instead of a fixed
  *    `repartition(dirCols)` inside the op. An input that is ALREADY
  *    clustered (e.g. read storage-partitioned from another table with
  *    the same bucketing) satisfies the distribution with no exchange
  *    at all — the write-side mirror of the storage-partitioned join.
  *  - **Commit metadata flows through commit messages, not a driver
  *    listing.** Each task writes its parquet files, reads its own
  *    footers, and ships complete `DataFile` entries (counts, bounds,
  *    split offsets, partition tuple) in its `WriterCommitMessage`.
  *    The driver never walks the output directory and never opens a
  *    footer — on an object store with a 100k-file commit that driver
  *    sweep is the difference between an O(1) commit and minutes of
  *    sequential HEAD/GET traffic. (The V1 path's `Files.walk` +
  *    parallel footer reads was local-FS thinking.)
  *
  * The same builder serves batch (INSERT INTO / df.writeTo /
  * INSERT OVERWRITE static+dynamic / CTAS) and Structured Streaming
  * (`writeStream.toTable("ice.db.t")`), with per-epoch exactly-once
  * commits keyed on (queryId, epochId) in table properties.
  *
  * Reference anchor: the C++ reference has writer interfaces but no
  * engine to run them (file_writer.h:90-100); this is the Spark-native
  * execution of that surface. */
final class GraftWriteBuilder(table: IceTable, identName: String,
    warehouse: String, info: LogicalWriteInfo) extends WriteBuilder
    with SupportsTruncate with SupportsOverwrite with SupportsDynamicOverwrite {

  private var mode: String = GraftWriteModes.Append
  private var overwriteFilters: Array[V1Filter] = Array.empty

  override def truncate(): WriteBuilder = { mode = GraftWriteModes.Truncate; this }

  override def overwrite(filters: Array[V1Filter]): WriteBuilder = {
    if (filters.forall(_.isInstanceOf[AlwaysTrue])) return truncate()
    mode = GraftWriteModes.OverwriteFilter
    overwriteFilters = filters
    this
  }

  override def overwriteDynamicPartitions(): WriteBuilder = {
    mode = GraftWriteModes.OverwriteDynamic; this
  }

  override def build(): Write =
    new GraftWrite(table, identName, warehouse, info, mode, overwriteFilters)
}

private[connector] object GraftWriteModes {
  val Append = "append"
  val Truncate = "truncate"
  val OverwriteFilter = "overwrite-filter"
  val OverwriteDynamic = "overwrite-dynamic"
  /** Row-level CoW: replace exactly the files the operation's scan
    * planned (see GraftRowLevel.scala). */
  val ReplaceGroups = "replace-groups"
}

final class GraftWrite(table: IceTable, identName: String, warehouse: String,
    info: LogicalWriteInfo, mode: String, overwriteFilters: Array[V1Filter],
    // replace-groups (row-level CoW): the files this write replaces and
    // the delete files the scan applied, resolved at COMMIT time from
    // the operation's scan (after runtime group filtering) — validated
    // against the current base on every commit attempt
    replacedFiles: Option[() => graft.ice.write.ReplaceGroupsState] = None)
    extends Write with RequiresDistributionAndOrdering {

  private val spec = table.spec
  private val schema = table.schema
  private val sortOrder = table.metadata.defaultSortOrder

  // keyless upsert tables refuse BEFORE any task writes a file (the
  // commit-time check remains as the backstop for races on the property)
  if (mode == GraftWriteModes.Append &&
      graft.ice.meta.TableProperties.get(table.metadata.properties,
        graft.ice.meta.TableProperties.UpsertEnabled)) {
    require(schema.identifierFieldIds.nonEmpty,
      "write.upsert.enabled requires identifier fields on the schema " +
        "(identifier-field-ids) to key the upsert")
  }

  /** Partition transforms as connector expressions (None when a field
    * uses a transform the grammar can't express, e.g. void — then we
    * request nothing and the writer handles interleaved partitions by
    * rolling files). */
  private def partitionExprs =
    GraftConnectorUtil.toV2Transforms(table).getOrElse(Array.empty)

  private def sortExprs: Array[V2SortOrder] = sortOrder.fields.flatMap { sf =>
    schema.findFieldById(sf.sourceId).map(_.name).map { col =>
      val term = sf.transform match {
        case IdentityTransform => Expressions.column(col)
        case other =>
          // express transform sort terms through the same grammar as
          // partitioning where possible; fall back to the raw column
          // (coarser clustering, still correct)
          Expressions.column(col)
      }
      Expressions.sort(term,
        if (sf.ascending) SortDirection.ASCENDING else SortDirection.DESCENDING,
        if (sf.nullsFirst) NullOrdering.NULLS_FIRST else NullOrdering.NULLS_LAST)
    }
  }.toArray

  override def requiredDistribution(): Distribution =
    if (!spec.isUnpartitioned && partitionExprs.nonEmpty)
      Distributions.clustered(partitionExprs.map(_.asInstanceOf[org.apache.spark.sql.connector.expressions.Expression]))
    else if (sortOrder.fields.nonEmpty && sortExprs.nonEmpty)
      Distributions.ordered(sortExprs)
    else Distributions.unspecified()

  /** Not strict: clustering is a file-count optimization, not a
    * correctness requirement (the writer rolls a new file when a
    * partition tuple reappears), and non-strict lets AQE coalesce the
    * write shuffle to the data's actual size. */
  override def distributionStrictlyRequired(): Boolean = false

  override def requiredOrdering(): Array[V2SortOrder] = {
    val partOrder = partitionExprs.map(t => Expressions.sort(
      t.asInstanceOf[org.apache.spark.sql.connector.expressions.Expression],
      SortDirection.ASCENDING))
    partOrder ++ sortExprs
  }

  private def taskConf(): GraftTaskWriteConf = {
    // align the query schema (InternalRow layout) with table field ids so
    // executor parquet footers carry ids for id-based projection on read
    val byName = schema.fields.map(f => f.name -> f).toMap
    val writeSchema = StructType(info.schema().fields.map { sf =>
      byName.get(sf.name) match {
        case Some(f) =>
          val t = SparkConv.toSparkField(f)
          StructField(f.name, t.dataType, sf.nullable, t.metadata)
        case None => sf // shouldn't happen post output-resolution
      }
    })
    GraftTaskWriteConf(
      writeSchema = writeSchema,
      schema = schema,
      spec = spec,
      outDir = s"${table.dataFileDir}/${UUID.randomUUID().toString}",
      targetFileSize = TableProperties.get(table.properties,
        TableProperties.WriteTargetFileSizeBytes),
      sortOrderId = table.metadata.defaultSortOrderId,
      compression = TableProperties.get(table.properties,
        TableProperties.ParquetCompression),
      compressionLevel = TableProperties.get(table.properties,
        TableProperties.ParquetCompressionLevel),
      parquetExtras = graft.ice.write.WriteTuning.parquetColumnExtras(
        table.properties) ++ Map(
        "parquet.page.row.count.limit" -> TableProperties.get(
          table.properties, TableProperties.ParquetPageRowLimit).toString,
        "parquet.page.size.row.check.min" -> TableProperties.get(table.properties,
          TableProperties.ParquetRowGroupCheckMinRecordCount).toString,
        "parquet.page.size.row.check.max" -> TableProperties.get(table.properties,
          TableProperties.ParquetRowGroupCheckMaxRecordCount).toString),
      rowGroupSize = TableProperties.get(table.properties,
        TableProperties.ParquetRowGroupSizeBytes),
      pageSize = TableProperties.get(table.properties,
        TableProperties.ParquetPageSizeBytes),
      dictSize = TableProperties.get(table.properties,
        TableProperties.ParquetDictSizeBytes),
      objectStore = graft.ice.write.ObjectStoreLayout.enabled(table.properties),
      objectStorePartitioned =
        graft.ice.write.ObjectStoreLayout.partitionedPaths(table.properties),
      metricsConfig = Some(graft.ice.write.MetricsConfig.from(
        table.properties, schema)))
  }

  override def toBatch: BatchWrite =
    new GraftBatchWrite(identName, warehouse, mode, overwriteFilters, taskConf(),
      replacedFiles)

  override def toStreaming: StreamingWrite =
    new GraftStreamingWrite(identName, warehouse, mode, info.queryId(), taskConf())

  override def description(): String = s"GraftWrite($identName, mode=$mode)"
}

/** Everything a task needs to write data files: pure case-class state,
  * serialized once into the writer factory. */
final case class GraftTaskWriteConf(
    writeSchema: StructType,
    schema: Schema,
    spec: PartitionSpec,
    outDir: String,
    targetFileSize: Long,
    sortOrderId: Int,
    compression: String,
    compressionLevel: String = "",
    parquetExtras: Map[String, String] = Map.empty,
    rowGroupSize: Long = 128L * 1024 * 1024,
    pageSize: Long = 1024L * 1024,
    dictSize: Long = 2L * 1024 * 1024,
    objectStore: Boolean = false,
    objectStorePartitioned: Boolean = true,
    metricsConfig: Option[graft.ice.write.MetricsConfig] = None) {
  /** outDir is `{dataRoot}/{commitUuid}`; the object-store layout needs
    * the two components separately. */
  def dataRoot: String = outDir.substring(0, outDir.lastIndexOf('/'))
  def commitId: String = outDir.substring(outDir.lastIndexOf('/') + 1)
}

final case class GraftWriteMessage(files: Seq[DataFile]) extends WriterCommitMessage

private[connector] object GraftCommit {

  def freshTable(warehouse: String, identName: String): IceTable =
    IceTable.load(new graft.ice.catalog.DirCatalog(warehouse),
      graft.ice.catalog.TableIdentifier.parse(identName))

  def entriesOf(messages: Array[WriterCommitMessage]): Seq[ManifestEntry] =
    messages.toSeq.flatMap {
      case GraftWriteMessage(files) => files.map(f =>
        ManifestEntry(ManifestStatus.Added, None, None, None, f))
      case _ => Nil
    }

  /** Commit `entries` under `mode`. Shared by batch and streaming
    * (streaming passes an idempotency property). */
  def commit(warehouse: String, identName: String, mode: String,
      overwriteFilters: Array[V1Filter], entries: Seq[ManifestEntry],
      extraProps: Map[String, String] = Map.empty,
      replacedFiles: Option[() => graft.ice.write.ReplaceGroupsState] = None): Unit = {
    val t = freshTable(warehouse, identName)
    val spark = SparkSession.active
    // Iceberg's session-level WAP staging: with spark.wap.id set, an
    // INSERT commits a STAGED snapshot (wap.id summary, no ref moves)
    // that publish_changes later cherry-picks onto main. Row-level and
    // overwrite writes refuse — replaying a rewrite is unsound; stage
    // those on a branch.
    // Staging is gated on the TABLE property write.wap.enabled
    // (table_properties.h:239, default false): without it the session
    // conf only stamps wap.id in the summary and the commit proceeds
    // normally — otherwise setting spark.wap.id once would silently
    // make every subsequent append on every table invisible.
    val sessionWapId = spark.conf.getOption("spark.wap.id").filter(_.nonEmpty)
    val wapEnabled = graft.ice.meta.TableProperties.get(
      t.metadata.properties, graft.ice.meta.TableProperties.WriteWapEnabled)
    val wapId = if (wapEnabled) sessionWapId else None
    val wapStamp = if (wapEnabled) Map.empty[String, String]
      else sessionWapId.map("wap.id" -> _).toMap
    if (wapId.isDefined && mode != GraftWriteModes.Append)
      throw new UnsupportedOperationException(
        s"spark.wap.id staging supports append writes only, not '$mode'; " +
          "use a branch (toBranch/fast_forward) to stage row-level changes")
    mode match {
      case GraftWriteModes.ReplaceGroups =>
        val st = replacedFiles.map(_.apply())
          .getOrElse(graft.ice.write.ReplaceGroupsState(Set.empty, Set.empty))
        SnapshotProducer.commit(t, spark, DataOperation.Overwrite, entries,
          removedPaths = st.replaced,
          expectedReplaced = Some(st),
          extraProps = extraProps, extraSummary = wapStamp)
      case GraftWriteModes.Append =>
        // `write.upsert.enabled` (table_properties.h:271): the V2 surface
        // honors the table's declaration exactly like the Scala append
        // API — SQL `INSERT INTO` an upsert table supersedes matched
        // keys instead of silently appending duplicates. Shape: ONE
        // commit of the new data files + an equality-delete file of
        // their distinct keys (churn-sized; the strict
        // dataSeq < deleteSeq rule keeps same-commit data unaffected) —
        // no corpus-sized join, the 100-TB upsert path.
        val upsert = graft.ice.meta.TableProperties.get(
          t.metadata.properties, graft.ice.meta.TableProperties.UpsertEnabled)
        val keyCols =
          if (!upsert) Nil
          else t.schema.identifierFieldIds
            .flatMap(id => t.schema.findFieldById(id).map(_.name))
        if (upsert) {
          require(keyCols.nonEmpty,
            "write.upsert.enabled requires identifier fields on the schema " +
              "(identifier-field-ids) to key the upsert")
          require(wapId.isEmpty,
            "write.upsert.enabled routes appends through keyed upsert, " +
              "which targets main directly — WAP staging of upserts is " +
              "not supported")
        }
        if (upsert && t.currentSnapshot.isDefined && entries.nonEmpty) {
          val newPaths = entries.map(_.dataFile.filePath)
          val keys = spark.read.parquet(newPaths: _*)
            .select(keyCols.map(org.apache.spark.sql.functions.col): _*)
            .distinct()
          val delEntries = t.delete(spark).equalityDeleteEntries(keys)
          SnapshotProducer.commit(t, spark, DataOperation.Overwrite, entries,
            addedDeleteEntries = delEntries,
            extraProps = extraProps, extraSummary = wapStamp)
        } else
          SnapshotProducer.commit(t, spark, DataOperation.Append, entries,
            extraProps = extraProps, stageWapId = wapId,
            extraSummary = wapStamp)
      case GraftWriteModes.Truncate =>
        val removed = t.newScan().planFiles().map(_.file.filePath).toSet
        SnapshotProducer.commit(t, spark, DataOperation.Overwrite, entries,
          removedPaths = removed, extraProps = extraProps,
          extraSummary = wapStamp)
      case GraftWriteModes.OverwriteDynamic =>
        val touched = entries.map(_.dataFile.partition).toSet
        val removed = t.newScan().planFiles()
          .filter(task => touched.contains(task.file.partition))
          .map(_.file.filePath).toSet
        SnapshotProducer.commit(t, spark, DataOperation.Overwrite, entries,
          removedPaths = removed, extraProps = extraProps,
          extraSummary = wapStamp)
      case GraftWriteModes.OverwriteFilter =>
        val removed = filesMatchedExactly(t, overwriteFilters)
        SnapshotProducer.commit(t, spark, DataOperation.Overwrite, entries,
          removedPaths = removed, extraProps = extraProps,
          extraSummary = wapStamp)
    }
    ()
  }

  /** Files whose rows are ALL matched by the overwrite filter. Exactness
    * requires every referenced column to be an identity partition source
    * — then the partition tuple determines the predicate for the whole
    * file and inclusive == strict. Anything else is "some but not all
    * rows might match" and must be rejected, not silently deleted. */
  def filesMatchedExactly(t: IceTable, filters: Array[V1Filter]): Set[String] = {
    val exprs = filters.map { f =>
      V1FilterToIce.convert(f, t).getOrElse(throw new UnsupportedOperationException(
        s"INSERT OVERWRITE filter not expressible on ${t.location}: $f"))
    }
    val expr = exprs.reduceOption(IceExpr.and).getOrElse(IceExpr.raw("true"))
    val bound = Binder.bind(expr, t.schema)
    val identitySources = t.spec.fields
      .filter(_.transform == IdentityTransform).map(_.sourceId).toSet
    def check(b: Bound): Unit = b match {
      case BAnd(l, r) => check(l); check(r)
      case BOr(l, r) => check(l); check(r)
      case BNot(c) => check(c)
      case BRaw(sql) => throw new UnsupportedOperationException(
        s"INSERT OVERWRITE by opaque predicate '$sql' cannot be matched " +
          "to whole files; use dynamic overwrite or DELETE + INSERT")
      case p: BPred if !identitySources.contains(p.fieldId) =>
        throw new UnsupportedOperationException(
          s"INSERT OVERWRITE filter references '${p.sourceName}', which is " +
            "not an identity partition column: some files could match only " +
            "part of their rows; use dynamic overwrite or DELETE + INSERT")
      case _ => ()
    }
    check(bound)
    val partPred = InclusiveProjection.project(bound, t.spec)
    val eval = new PartitionTupleEvaluator(t.spec)
    t.newScan().planFiles()
      .filter(task => eval.eval(partPred, task.file.partition))
      .map(_.file.filePath).toSet
  }

  def abortFiles(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GraftWriteMessage(files) => files.foreach { f =>
        try java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(f.filePath))
        catch { case _: Exception => () }
      }
      case _ => ()
    }
}

final class GraftBatchWrite(identName: String, warehouse: String, mode: String,
    overwriteFilters: Array[V1Filter], conf: GraftTaskWriteConf,
    replacedFiles: Option[() => graft.ice.write.ReplaceGroupsState] = None)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftDataWriterFactory(conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    GraftCommit.commit(warehouse, identName, mode, overwriteFilters,
      GraftCommit.entriesOf(messages), replacedFiles = replacedFiles)

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    GraftCommit.abortFiles(messages)
}

/** Streaming flavor: same task writers, per-epoch commits. Exactly-once
  * across restarts via a (queryId -> epochId) watermark in table
  * properties — a replayed epoch (sink committed, checkpoint didn't)
  * skips its duplicate commit and removes the replay's files. */
final class GraftStreamingWrite(identName: String, warehouse: String,
    mode: String, queryId: String, conf: GraftTaskWriteConf) extends StreamingWrite {

  private def epochKey = s"graft.stream.epoch.$queryId"

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftStreamingDataWriterFactory(conf)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val t = GraftCommit.freshTable(warehouse, identName)
    val committed = t.properties.get(epochKey).flatMap(_.toLongOption)
    if (committed.exists(_ >= epochId)) {
      // epoch already landed in a previous run — drop the replay's files
      GraftCommit.abortFiles(messages)
      return
    }
    val streamMode =
      if (mode == GraftWriteModes.Truncate) GraftWriteModes.Truncate
      else GraftWriteModes.Append
    GraftCommit.commit(warehouse, identName, streamMode, Array.empty,
      GraftCommit.entriesOf(messages),
      extraProps = Map(epochKey -> epochId.toString))
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    GraftCommit.abortFiles(messages)
}

final class GraftDataWriterFactory(conf: GraftTaskWriteConf) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(conf, partitionId, taskId, epochId = -1L)
}

final class GraftStreamingDataWriterFactory(conf: GraftTaskWriteConf)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(conf, partitionId, taskId, epochId)
}

/** Per-task writer: rows arrive (when the plan honored the requested
  * distribution+ordering) clustered by partition tuple, so one parquet
  * writer is open at a time; a tuple change or the target file size
  * rolls the file. Footer metrics are read HERE, executor-side, and the
  * complete `DataFile` ships in the commit message. */
final class GraftDataWriter(conf: GraftTaskWriteConf, partitionId: Int,
    taskId: Long, epochId: Long) extends DataWriter[InternalRow] {

  private val hadoopConf: Configuration = {
    val c = new Configuration()
    ParquetWriteSupport.setSchema(conf.writeSchema, c)
    c.set("spark.sql.parquet.writeLegacyFormat", "false")
    c.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    c.set("spark.sql.parquet.fieldId.write.enabled", "true")
    c.set("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
    c.set("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
    c.set("spark.sql.parquet.variant.annotateLogicalType.enabled", "false")
    c.set("spark.sql.variant.writeShredding.enabled", "false")
    // write.parquet.compression-level, same per-codec key the path-based
    // writers get from WriteTuning — SQL INSERTs and DataFrame appends
    // must not be tuned differently from Ops.writeDataFiles output
    if (conf.compressionLevel.nonEmpty) {
      val codec = if (conf.compression == "none") "uncompressed" else conf.compression
      c.set(s"parquet.compression.codec.$codec.level", conf.compressionLevel)
    }
    // per-column bloom filters / stats toggles / page-row-limit — the
    // same parquet-java keys WriteTuning hands the path-based writers
    conf.parquetExtras.foreach { case (k, v) => c.set(k, v) }
    c
  }

  // per-spec-field evaluation state: ordinal in the row, spark type,
  // iceberg source type, transform
  private case class PartEval(ordinal: Int, sparkType: DataType,
      iceType: IcePrimitive, transform: graft.ice.transform.Transform,
      fieldName: String)

  private val partEvals: IndexedSeq[PartEval] = conf.spec.fields.map { pf =>
    val src = conf.schema.findFieldById(pf.sourceId).getOrElse(
      throw new IllegalStateException(s"partition source ${pf.sourceId} missing"))
    val ordinal = conf.writeSchema.fieldIndex(src.name)
    PartEval(ordinal, conf.writeSchema(ordinal).dataType,
      src.fieldType.asInstanceOf[IcePrimitive], pf.transform, pf.name)
  }

  private val done = ArrayBuffer.empty[DataFile]
  private var writer: ParquetWriter[InternalRow] = _
  private var curTuple: IndexedSeq[Any] = _
  private var curPath: String = _
  private var rowsInFile: Long = 0L
  private var fileNo: Int = 0

  private def iceValue(row: InternalRow, pe: PartEval): Any = {
    if (row.isNullAt(pe.ordinal)) return null
    pe.sparkType match {
      case StringType => row.getUTF8String(pe.ordinal).toString
      case IntegerType | DateType => row.getInt(pe.ordinal)
      case LongType | TimestampType | TimestampNTZType => row.getLong(pe.ordinal)
      case BooleanType => row.getBoolean(pe.ordinal)
      case FloatType => row.getFloat(pe.ordinal)
      case DoubleType => row.getDouble(pe.ordinal)
      case d: DecimalType =>
        row.getDecimal(pe.ordinal, d.precision, d.scale).toJavaBigDecimal
      case BinaryType => row.getBinary(pe.ordinal)
      case ShortType => row.getShort(pe.ordinal).toInt
      case ByteType => row.getByte(pe.ordinal).toInt
      case other => throw new UnsupportedOperationException(
        s"partition source type $other")
    }
  }

  private def tupleOf(row: InternalRow): IndexedSeq[Any] =
    partEvals.map(pe => pe.transform.apply(iceValue(row, pe), pe.iceType))

  private def sameTuple(a: IndexedSeq[Any], b: IndexedSeq[Any]): Boolean = {
    var i = 0
    while (i < a.length) {
      (a(i), b(i)) match {
        case (x: Array[Byte], y: Array[Byte]) =>
          if (!java.util.Arrays.equals(x, y)) return false
        case (x, y) => if (x != y) return false
      }
      i += 1
    }
    true
  }

  private def renderDirValue(v: Any): String = v match {
    case null => "__HIVE_DEFAULT_PARTITION__"
    case b: Array[Byte] => b.map("%02x".format(_)).mkString
    case s: String =>
      val sb = new StringBuilder
      s.foreach { c =>
        if (c.isLetterOrDigit || c == '.' || c == '-' || c == '_') sb.append(c)
        else if (c < 256) sb.append(f"%%$c%02X")
        else sb.append(c)
      }
      sb.toString
    case other => other.toString
  }

  private def dirPath(tuple: IndexedSeq[Any]): String =
    partEvals.zip(tuple).map { case (pe, v) =>
      s"${PartitionPaths.dirCol(pe.fieldName)}=${renderDirValue(v)}"
    }.mkString("/")

  private def newFilePath(tuple: IndexedSeq[Any]): String = {
    val epoch = if (epochId >= 0) s"-$epochId" else ""
    fileNo += 1
    val name = s"part-$partitionId-$taskId$epoch-$fileNo.parquet"
    val partDirs = if (partEvals.isEmpty) "" else dirPath(tuple)
    // object-store layout: each file under its own hash-prefix dirs
    // (computed HERE on the executor — no post-write relocation pass)
    if (conf.objectStore)
      graft.ice.write.ObjectStoreLayout.place(conf.dataRoot, conf.commitId,
        partDirs, name, conf.objectStorePartitioned)
    else if (partDirs.isEmpty) s"${conf.outDir}/$name"
    else s"${conf.outDir}/$partDirs/$name"
  }

  private def openFile(tuple: IndexedSeq[Any]): Unit = {
    curPath = newFilePath(tuple)
    curTuple = tuple
    rowsInFile = 0L
    val builder0 = new GraftRowParquetWriterBuilder(new HPath(curPath))
      .withConf(hadoopConf)
      .withCompressionCodec(CompressionCodecName.fromConf(
        (if (conf.compression == "none") "uncompressed" else conf.compression)
          .toUpperCase(java.util.Locale.ROOT)))
      .withRowGroupSize(conf.targetFileSize.min(conf.rowGroupSize))
      .withPageSize(conf.pageSize.toInt)
      .withDictionaryPageSize(conf.dictSize.toInt)
    // ParquetWriter.Builder does NOT parse per-column conf keys the way
    // ParquetOutputFormat does — translate them to builder calls so the
    // connector write path honors the same bloom/stats/page-row knobs
    val builder = conf.parquetExtras.foldLeft(builder0) { case (b, (k, v)) =>
      val col = k.substring(k.indexOf('#') + 1)
      k match {
        case _ if k.startsWith("parquet.bloom.filter.enabled#") =>
          b.withBloomFilterEnabled(col, v.toBoolean)
        case _ if k.startsWith("parquet.bloom.filter.fpp#") =>
          b.withBloomFilterFPP(col, v.toDouble)
        case _ if k.startsWith("parquet.column.statistics.enabled#") =>
          b.withStatisticsEnabled(col, v.toBoolean)
        case "parquet.bloom.filter.max.bytes" =>
          b.withMaxBloomFilterBytes(v.toInt)
        case "parquet.page.row.count.limit" =>
          b.withPageRowCountLimit(v.toInt)
        case "parquet.page.size.row.check.min" =>
          b.withMinRowCountForPageSizeCheck(v.toInt)
        case "parquet.page.size.row.check.max" =>
          b.withMaxRowCountForPageSizeCheck(v.toInt)
        case _ => b
      }
    }
    writer = builder.build()
  }

  private def closeFile(): Unit = {
    if (writer == null) return
    writer.close()
    val m = Metrics.fromParquetFooter(curPath, conf.schema, hadoopConf,
      conf.metricsConfig)
    done += DataFile(FileContent.Data, curPath, "PARQUET", curTuple,
      recordCount = m.rowCount,
      fileSizeInBytes = java.nio.file.Files.size(java.nio.file.Paths.get(curPath)),
      columnSizes = m.columnSizes, valueCounts = m.valueCounts,
      nullValueCounts = m.nullValueCounts,
      lowerBounds = m.lowerBounds, upperBounds = m.upperBounds,
      splitOffsets = m.splitOffsets,
      sortOrderId = Some(conf.sortOrderId))
    writer = null
  }

  override def write(row: InternalRow): Unit = {
    val tuple = tupleOf(row)
    if (writer == null) openFile(tuple)
    else if (!sameTuple(tuple, curTuple)) { closeFile(); openFile(tuple) }
    else if (rowsInFile > 0 && (rowsInFile & 0x3FF) == 0 &&
        writer.getDataSize > conf.targetFileSize) {
      closeFile(); openFile(tuple)
    }
    writer.write(row)
    rowsInFile += 1
  }

  override def commit(): WriterCommitMessage = {
    closeFile()
    GraftWriteMessage(done.toSeq)
  }

  override def abort(): Unit = {
    if (writer != null) { try writer.close() catch { case _: Exception => () }; writer = null }
    done.foreach { f =>
      try java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(f.filePath))
      catch { case _: Exception => () }
    }
    if (curPath != null) {
      try java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(curPath))
      catch { case _: Exception => () }
    }
  }

  override def close(): Unit =
    if (writer != null) { try writer.close() catch { case _: Exception => () }; writer = null }
}

/** parquet-hadoop builder over Spark's own `ParquetWriteSupport`: the
  * exact write path Spark's parquet sink uses (same physical encodings,
  * field-id stamping, timestamp handling), minus the FileFormatWriter
  * scaffolding we replace with the V2 DataWriter contract. */
private final class GraftRowParquetWriterBuilder(path: HPath)
    extends ParquetWriter.Builder[InternalRow, GraftRowParquetWriterBuilder](path) {
  override def self(): GraftRowParquetWriterBuilder = this
  override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] =
    new ParquetWriteSupport
}
