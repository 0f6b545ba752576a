package graft.ice.write

import java.io.{ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ice.IceTable
import graft.ice.manifest.Puffin
import graft.ice.meta.{BlobMetadata, StatisticsFile}

/** Table statistics as REAL puffin sketch blobs (C11+; the reference
  * models StatisticsFile metadata only, statistics_file.h:35-81 — here
  * the sketches are computed, written and readable back).
  *
  * Sketch: KMV (k-minimum-values) over xxhash64 of the column — the k
  * smallest distinct hashes. Below k distinct values the sketch IS the
  * distinct hash set and the NDV is exact; above, the classic estimator
  * ndv ≈ (k-1)/u(h_k) applies (u = fraction of the hash space below the
  * k-th smallest). KMV sketches are mergeable (union, keep k smallest),
  * deterministic (no RNG), and a few KB per column at k=16384.
  *
  * Scale shape: ONE distributed pass over the scan computes every
  * column's sketch — hash per column, posexplode, distinct, per-column
  * ascending top-k window; only nColumns × k longs reach the driver. */
object Statistics {

  /** Blob type written since r7: the Apache DataSketches compact ordered
    * theta serialization (the Iceberg spec's standard NDV blob type) —
    * the KMV state IS a theta sketch (retained = the k-1 smallest 63-bit
    * hash values, θ = the k-th), so the re-encode is a transform + frame.
    * Caveat, documented honestly: the retained values derive from
    * xxhash64 (the codegen'd one-pass scan hash), not DataSketches'
    * murmur3-128(seed 9001) of the Iceberg single-value serialization —
    * blobs parse and ESTIMATE correctly in any theta reader, but a
    * cross-engine sketch UNION needs identical input hashing. */
  val ThetaBlobType = "apache-datasketches-theta-v1"
  val KmvBlobType = "graft-kmv-v1" // legacy blobs readable via kmvFromBytes
  val NdvProperty = "ndv"

  /** Serialized KMV blob: k, count, then `count` sorted hashes. */
  def kmvBytes(k: Int, hashes: Array[Long]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val d = new DataOutputStream(out)
    d.writeInt(k)
    d.writeInt(hashes.length)
    hashes.foreach(d.writeLong)
    d.flush()
    out.toByteArray
  }

  /** Parse a KMV blob back to (k, sorted hashes). */
  def kmvFromBytes(bytes: Array[Byte]): (Int, Array[Long]) = {
    val d = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val k = d.readInt()
    val n = d.readInt()
    (k, Array.fill(n)(d.readLong()))
  }

  /** NDV from a KMV sketch: exact below k, estimated at k. Hashes are
    * signed longs; u(h) = (h - Long.MinValue)/2^64 maps them monotonically
    * onto [0,1), so "k smallest signed" == "k smallest in u". */
  def kmvNdv(k: Int, hashes: Array[Long]): Long =
    if (hashes.length < k) hashes.length.toLong
    else {
      val u = (hashes.last.toDouble - Long.MinValue.toDouble) /
        math.pow(2.0, 64)
      math.round((k - 1).toDouble / math.max(u, Double.MinPositiveValue))
    }

  /** Merge two sketches (union, keep the k smallest) — the property that
    * lets per-file or per-partition sketches roll up without rescanning. */
  def kmvMerge(k: Int, a: Array[Long], b: Array[Long]): Array[Long] =
    (a ++ b).distinct.sorted.take(k)

  // ---- Apache DataSketches theta compact-ordered serialization ----
  // (public format: serVer 3, family COMPACT=3; preamble flags
  //  READ_ONLY|COMPACT|ORDERED, little-endian words; values are 63-bit
  //  positive longs strictly below theta)

  private val FlagReadOnly = 2
  private val FlagEmpty = 4
  private val FlagCompact = 8
  private val FlagOrdered = 16
  private val DefaultSeed = 9001L

  /** Map a signed 64-bit hash onto theta's 63-bit positive domain,
    * preserving order: flip the sign bit (signed order -> unsigned order)
    * then drop the lowest bit. */
  private def theta63(h: Long): Long = (h ^ Long.MinValue) >>> 1

  /** DataSketches seed hash: low 16 bits of murmur3-128(seed), must be
    * nonzero (PreambleUtil.computeSeedHash semantics). */
  private[write] def seedHash(seed: Long): Short = {
    val h = murmur128(seed, 0L)
    val sh = (h & 0xFFFFL).toShort
    require(sh != 0, s"seed $seed hashes to 0")
    sh
  }

  /** MurmurHash3 x64-128 of one long (returns h1) — the public algorithm,
    * used only to stamp the preamble's seed-hash field. */
  private def murmur128(key: Long, seed: Long): Long = {
    val c1 = 0x87c37b91114253d5L
    val c2 = 0x4cf5ad432745937fL
    var h1 = seed; var h2 = seed
    var k1 = key
    k1 *= c1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= c2
    h1 ^= k1
    h1 ^= 8L; h2 ^= 8L
    h1 += h2; h2 += h1
    h1 = fmix64(h1); h2 = fmix64(h2)
    h1 += h2
    h1
  }
  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** Encode the KMV state (k smallest signed hashes, ascending) as a
    * compact ordered theta sketch: below k retained entries the sketch is
    * exact (θ = 2^63); at k the k-th smallest value becomes θ and the
    * remaining k-1 are retained. Little-endian throughout. */
  def thetaBytes(k: Int, hashes: Array[Long]): Array[Byte] = {
    val estimating = hashes.length >= k
    val theta = if (estimating) theta63(hashes.last) else Long.MaxValue
    val retained =
      if (estimating) hashes.dropRight(1).map(theta63)
      else hashes.map(theta63)
    val empty = retained.isEmpty && !estimating
    val preLongs = if (empty) 1 else if (estimating) 3 else 2
    val buf = java.nio.ByteBuffer.allocate(8 * (preLongs + retained.length))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var flags = FlagReadOnly | FlagCompact | FlagOrdered
    if (empty) flags |= FlagEmpty
    buf.put(preLongs.toByte).put(3.toByte /* serVer */)
      .put(3.toByte /* family: compact */).put(0.toByte).put(0.toByte)
      .put(flags.toByte).putShort(seedHash(DefaultSeed))
    if (!empty) {
      buf.putInt(retained.length).putInt(0)
      if (estimating) buf.putLong(theta)
      retained.foreach(buf.putLong)
    }
    buf.array()
  }

  /** Parse a compact theta sketch back to (theta, retained values). */
  def thetaFromBytes(bytes: Array[Byte]): (Long, Array[Long]) = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val preLongs = buf.get().toInt
    val serVer = buf.get().toInt
    val family = buf.get().toInt
    require(serVer == 3 && family == 3, s"not a compact theta sketch " +
      s"(serVer=$serVer family=$family)")
    buf.get(); buf.get()
    val flags = buf.get().toInt
    buf.getShort() // seed hash
    if ((flags & FlagEmpty) != 0 || preLongs == 1)
      return (Long.MaxValue, Array.empty[Long])
    val count = buf.getInt(); buf.getInt()
    val theta = if (preLongs >= 3) buf.getLong() else Long.MaxValue
    (theta, Array.fill(count)(buf.getLong()))
  }

  /** NDV from a parsed theta sketch: exact when θ = 2^63-1 (sub-k),
    * count/|θ| otherwise — numerically the same estimator as kmvNdv. */
  def thetaNdv(theta: Long, retained: Array[Long]): Long =
    if (theta == Long.MaxValue) retained.length.toLong
    else math.round(retained.length.toDouble /
      (theta.toDouble / math.pow(2.0, 63)))

  /** Compute per-column KMV sketches over the table's CURRENT snapshot in
    * one distributed pass, write them as one puffin statistics file under
    * the metadata dir, and commit the StatisticsFile entry (replacing any
    * prior statistics of the same snapshot — Iceberg SetStatistics
    * semantics). Returns the committed entry. */
  /** Registered NDV estimates (column name → ndv) for a snapshot,
    * falling back to the current snapshot's statistics file. Read from
    * blob METADATA properties — planning never opens the puffin file. */
  def ndvByName(table: IceTable, snapshotId: Option[Long]): Map[String, Long] = {
    val sid = snapshotId.orElse(table.currentSnapshot.map(_.snapshotId))
    val sf = sid.flatMap(id => table.metadata.statistics.find(_.snapshotId == id))
      .orElse(table.metadata.statistics.lastOption)
    sf.toSeq.flatMap(_.blobMetadata)
      .filter(_.blobType == ThetaBlobType)
      .flatMap { b =>
        for {
          fieldId <- b.fields.headOption
          name <- table.schema.findFieldById(fieldId).map(_.name)
          ndv <- b.properties.get(NdvProperty).flatMap(_.toLongOption)
          if ndv > 0
        } yield name -> ndv
      }.toMap
  }

  /** Selectivity of a pruning predicate against NDV sketches — the
    * CBO-lite estimate the V2 scan reports to Spark's join selection
    * (reference keeps NDV metadata-only, statistics_file.h:35-81; here
    * the sketches actually move plans). Deliberately conservative:
    * only equality/IN over identity terms with a known NDV reduce the
    * estimate (uniformity assumption, rows/ndv per matched key); range
    * and unknown predicates estimate 1.0, so a missing sketch can only
    * make the scan look BIGGER than it is — never broadcast something
    * huge by mistake. */
  def selectivityOf(expr: graft.ice.expr.Expr, ndv: Map[String, Long]): Double = {
    import graft.ice.expr._
    def walk(e: Expr): Double = e match {
      case TrueE => 1.0
      case FalseE => 0.0
      case AndE(l, r) => walk(l) * walk(r)
      case OrE(l, r) => math.min(1.0, walk(l) + walk(r))
      // NOT of an estimate whose complement we can't bound: no reduction
      case NotE(_) => 1.0
      case Predicate(graft.ice.expr.Op.Eq,
          Term(name, graft.ice.transform.IdentityTransform), _) =>
        ndv.get(name).map(n => 1.0 / n).getOrElse(1.0)
      case Predicate(graft.ice.expr.Op.In,
          Term(name, graft.ice.transform.IdentityTransform), lits) =>
        ndv.get(name).map(n => math.min(1.0, lits.size.toDouble / n)).getOrElse(1.0)
      case _ => 1.0
    }
    math.max(1e-9, math.min(1.0, walk(expr)))
  }

  def compute(table: IceTable, spark: SparkSession,
      columns: Seq[String] = Nil, k: Int = 16384): StatisticsFile = {
    val snap = table.currentSnapshot.getOrElse(
      throw new IllegalStateException("computeStatistics: table has no snapshot"))
    val schema = table.schema
    val targets =
      if (columns.nonEmpty) columns.map(c => schema.findFieldByName(c).getOrElse(
        throw new IllegalArgumentException(s"no such column $c")))
      else schema.fields.filter(_.fieldType.isInstanceOf[graft.ice.types.IcePrimitive]).toSeq
    require(targets.nonEmpty, "computeStatistics: no columns to sketch")

    // one pass: hash every target column, posexplode to (column idx, hash),
    // distinct, then per-column k smallest — shuffles 8-byte hashes only.
    // NULLs are masked per column BEFORE the explode: xxhash64(NULL) is a
    // seed constant that would otherwise pollute every sketch.
    val df = table.newScan().select(targets.map(_.name): _*).toDF(spark)
    val perCol = df.select(posexplode(array(targets.map(f =>
      struct(col(f.name).isNull.as("n"), xxhash64(col(f.name)).as("h"))): _*))
      .as(Seq("__c", "__z")))
      .where(!col("__z.n"))
      .select(col("__c"), col("__z.h").as("__h"))
      .distinct()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("__c").orderBy("__h")
    val topk = perCol.withColumn("__r", row_number().over(w))
      .where(col("__r") <= k)
      .select("__c", "__h")
      .collect()
      .groupBy(_.getInt(0))
      .map { case (c, rows) => c -> rows.map(_.getLong(1)).sorted }

    val blobs = targets.zipWithIndex.map { case (f, i) =>
      val hashes = topk.getOrElse(i, Array.empty[Long])
      Puffin.BlobSpec(ThetaBlobType, Seq(f.id), snap.snapshotId,
        snap.sequenceNumber,
        Map(NdvProperty -> kmvNdv(k, hashes).toString,
          "column-name" -> f.name),
        thetaBytes(k, hashes))
    }
    val path = s"${table.metadataFileDir}/${java.util.UUID.randomUUID()}-stats.puffin"
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(table.metadataFileDir))
    val (refs, footerSize) = Puffin.writeBlobFile(path, blobs)
    val statsFile = StatisticsFile(snap.snapshotId, path,
      java.nio.file.Files.size(java.nio.file.Paths.get(path)), footerSize,
      refs.map(r => BlobMetadata(r.blobType, r.snapshotId, r.sequenceNumber,
        r.fields, r.properties)))
    table.commit(base => base.copy(
      statistics = base.statistics.filterNot(_.snapshotId == snap.snapshotId)
        :+ statsFile,
      lastUpdatedMs = System.currentTimeMillis()))
    statsFile
  }

  /** Compute + register a PARTITION statistics file (the spec's
    * partition-statistics list; metadata-only in the reference,
    * statistics_file.h:96-120): one row per (partition, spec_id) with
    * data/delete file counts, record counts and byte sizes, written as a
    * parquet file sorted by partition and registered in table metadata.
    *
    * Scale shape: aggregates MANIFEST metadata only — no data file is
    * opened; the row count is bounded by the live partition count. The
    * `partition` column is the same human-readable `/`-joined transform
    * tuple the `partitions` metadata table exposes (the typed tuple
    * remains available per-row via the `_partition` metadata column). */
  def computePartitionStats(table: IceTable,
      spark: SparkSession): graft.ice.meta.PartitionStatisticsFile = {
    val snap = table.currentSnapshot.getOrElse(
      throw new IllegalStateException("computePartitionStats: table has no snapshot"))
    def key(p: IndexedSeq[Any]): String =
      p.map(v => if (v == null) "null" else v.toString).mkString("/")
    val data = table.planEntries(snap, None).map(e => (e, e.specId))
    val dels = table.planDeleteEntries(snap)
    val parts = (data.map(_._1.dataFile.partition) ++ dels.map(_.dataFile.partition))
      .map(key).distinct.sorted
    import graft.ice.manifest.FileContent
    val rows = parts.map { p =>
      val d = data.filter(x => key(x._1.dataFile.partition) == p)
      val (pos, eq) = dels.filter(x => key(x.dataFile.partition) == p)
        .partition(_.dataFile.content == FileContent.PositionDeletes)
      (p,
        d.map(_._2).distinct.sorted.lastOption.getOrElse(table.spec.specId),
        d.map(_._1.dataFile.recordCount).sum,
        d.size.toLong,
        d.map(_._1.dataFile.fileSizeInBytes).sum,
        pos.map(_.dataFile.recordCount).sum, pos.size.toLong,
        eq.map(_.dataFile.recordCount).sum, eq.size.toLong,
        d.map(_._1.dataFile.recordCount).sum - pos.map(_.dataFile.recordCount).sum,
        snap.timestampMs, snap.snapshotId)
    }
    import spark.implicits._
    val df = rows.toDF("partition", "spec_id", "data_record_count",
      "data_file_count", "total_data_file_size_in_bytes",
      "position_delete_record_count", "position_delete_file_count",
      "equality_delete_record_count", "equality_delete_file_count",
      "total_record_count", "last_updated_at", "last_updated_snapshot_id")
    val dir = s"${table.metadataFileDir}/${java.util.UUID.randomUUID()}-partition-stats"
    df.coalesce(1).sortWithinPartitions("partition").write.parquet(dir)
    import scala.jdk.CollectionConverters._
    val file = java.nio.file.Files.list(java.nio.file.Paths.get(dir)).iterator.asScala
      .map(_.toString).filter(_.endsWith(".parquet")).toSeq.head
    val psf = graft.ice.meta.PartitionStatisticsFile(snap.snapshotId, file,
      java.nio.file.Files.size(java.nio.file.Paths.get(file)))
    table.commit(base => base.copy(
      partitionStatistics =
        base.partitionStatistics.filterNot(_.snapshotId == snap.snapshotId) :+ psf,
      lastUpdatedMs = System.currentTimeMillis()))
    psf
  }
}
