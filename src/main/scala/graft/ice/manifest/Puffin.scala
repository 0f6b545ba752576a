package graft.ice.manifest

import java.io.{ByteArrayOutputStream, DataOutputStream, RandomAccessFile}
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32

import com.fasterxml.jackson.databind.ObjectMapper
import org.roaringbitmap.longlong.Roaring64Bitmap

/** Puffin file writer/reader for deletion-vector blobs (v3 row-level
  * deletes). The reference enumerates PUFFIN (file_format.h:34-40) and
  * models statistics files (statistics_file.h:35-81) but implements no
  * reader/writer; this completes the v3 delete story the metadata layer
  * already speaks (Manifest.scala referenced_data_file/content_offset/
  * content_size_in_bytes, manifest_entry.h:162-176).
  *
  * Layout (Apache Puffin spec): "PFA1" magic, concatenated blobs, then
  * footer = magic + JSON payload + payload-size (4B LE) + flags (4B) +
  * magic. A `deletion-vector-v1` blob is: combined length of magic+vector
  * (4B big-endian), magic D1 D3 39 64, the 64-bit roaring bitmap in
  * portable serialization, CRC-32 of magic+vector (4B big-endian). The
  * manifest's content_offset/content_size_in_bytes point straight at a
  * blob, so the scan reads a vector without parsing the footer. */
object Puffin {

  private val FileMagic = Array[Byte]('P', 'F', 'A', '1')
  private val DVMagic = Array[Byte](0xD1.toByte, 0xD3.toByte, 0x39.toByte, 0x64.toByte)
  val DVBlobType = "deletion-vector-v1"

  /** One written deletion vector: where its blob landed and what it covers. */
  final case class DVRef(referencedDataFile: String, offset: Long,
      length: Long, cardinality: Long)

  /** A generic blob to write (statistics sketches, deletion vectors). */
  final case class BlobSpec(blobType: String, fields: Seq[Int],
      snapshotId: Long, sequenceNumber: Long,
      properties: Map[String, String], data: Array[Byte])

  /** A written blob: footer metadata + where it landed. */
  final case class BlobRef(blobType: String, offset: Long, length: Long,
      fields: Seq[Int], snapshotId: Long, sequenceNumber: Long,
      properties: Map[String, String])

  /** Serialize one DV blob (length prefix + magic + portable bitmap + crc). */
  private[manifest] def dvBlobBytes(bitmapPortable: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val d = new DataOutputStream(out)
    d.writeInt(DVMagic.length + bitmapPortable.length) // big-endian
    d.write(DVMagic)
    d.write(bitmapPortable)
    val crc = new CRC32()
    crc.update(DVMagic)
    crc.update(bitmapPortable)
    d.writeInt(crc.getValue.toInt) // big-endian, low 32 bits
    d.flush()
    out.toByteArray
  }

  /** Portable serialization of a bitmap built from sorted-or-not positions. */
  def serializePositions(positions: Iterator[Long]): (Array[Byte], Long) = {
    val bm = new Roaring64Bitmap()
    positions.foreach(bm.addLong)
    bm.runOptimize()
    val out = new ByteArrayOutputStream()
    bm.serialize(new DataOutputStream(out))
    (out.toByteArray, bm.getLongCardinality)
  }

  /** Write ONE puffin file holding arbitrary blobs (spec layout: magic,
    * concatenated blob bytes, footer). Returns the blob refs (offsets/
    * lengths match the footer exactly) and the footer size in bytes
    * (magic + payload + 8 — the StatisticsFile footer-size field). */
  def writeBlobFile(path: String, blobs: Seq[BlobSpec]): (Seq[BlobRef], Long) = {
    val mapper = new ObjectMapper()
    val raf = new java.io.FileOutputStream(path)
    val out = new DataOutputStream(new java.io.BufferedOutputStream(raf))
    try {
      out.write(FileMagic)
      var pos = FileMagic.length.toLong
      val refs = blobs.map { b =>
        out.write(b.data)
        val r = BlobRef(b.blobType, pos, b.data.length.toLong, b.fields,
          b.snapshotId, b.sequenceNumber, b.properties)
        pos += b.data.length
        r
      }
      // footer payload: blob metadata (offset/length must equal the refs)
      val root = mapper.createObjectNode()
      val arr = mapper.createArrayNode()
      refs.foreach { r =>
        val b = mapper.createObjectNode()
        b.put("type", r.blobType)
        val fs = mapper.createArrayNode()
        r.fields.foreach(fs.add)
        b.set("fields", fs)
        b.put("snapshot-id", r.snapshotId)
        b.put("sequence-number", r.sequenceNumber)
        b.put("offset", r.offset)
        b.put("length", r.length)
        val props = mapper.createObjectNode()
        r.properties.toSeq.sortBy(_._1).foreach { case (k, v) => props.put(k, v) }
        b.set("properties", props)
        arr.add(b)
      }
      root.set("blobs", arr)
      val payload = mapper.writeValueAsBytes(root)
      out.write(FileMagic)
      out.write(payload)
      // payload size: 4-byte little-endian; flags: 4 zero bytes
      out.write(Array[Byte](
        (payload.length & 0xff).toByte, ((payload.length >> 8) & 0xff).toByte,
        ((payload.length >> 16) & 0xff).toByte, ((payload.length >> 24) & 0xff).toByte))
      out.write(Array[Byte](0, 0, 0, 0))
      out.write(FileMagic)
      (refs, FileMagic.length.toLong + payload.length + 8)
    } finally out.close()
  }

  /** Write ONE puffin file holding a deletion vector per referenced data
    * file. `dvs` = (referenced data file, portable bitmap bytes,
    * cardinality); returns blob refs whose offset/length go into the
    * manifest entry verbatim (they must match the footer, and do). */
  def writeDVFile(path: String,
      dvs: Seq[(String, Array[Byte], Long)]): Seq[DVRef] = {
    val (refs, _) = writeBlobFile(path, dvs.map { case (refFile, bmBytes, card) =>
      BlobSpec(DVBlobType, Nil, -1L, -1L,
        Map("referenced-data-file" -> refFile, "cardinality" -> card.toString),
        dvBlobBytes(bmBytes))
    })
    refs.map(r => DVRef(r.properties("referenced-data-file"), r.offset,
      r.length, r.properties("cardinality").toLong))
  }

  /** Direct-access read of one deletion vector given the manifest's
    * content_offset/content_size_in_bytes. Validates magic and CRC —
    * a corrupt vector must fail the scan, not silently resurrect rows.
    * Runs on executors (one task per blob on the read path). */
  def readDV(path: String, offset: Long, length: Long): Roaring64Bitmap = {
    val raf = new RandomAccessFile(path, "r")
    try {
      raf.seek(offset)
      val blob = new Array[Byte](length.toInt)
      raf.readFully(blob)
      val declared = ((blob(0) & 0xff) << 24) | ((blob(1) & 0xff) << 16) |
        ((blob(2) & 0xff) << 8) | (blob(3) & 0xff)
      require(declared == length - 8,
        s"DV blob length mismatch at $path@$offset: declared $declared, blob $length")
      require(blob.slice(4, 8).sameElements(DVMagic),
        s"bad DV magic at $path@$offset")
      val vec = blob.slice(8, blob.length - 4)
      val crc = new CRC32()
      crc.update(blob, 4, blob.length - 8) // magic + vector
      val stored = ((blob(blob.length - 4) & 0xffL) << 24) |
        ((blob(blob.length - 3) & 0xffL) << 16) |
        ((blob(blob.length - 2) & 0xffL) << 8) | (blob(blob.length - 1) & 0xffL)
      require((crc.getValue & 0xffffffffL) == stored,
        s"DV CRC mismatch at $path@$offset")
      val bm = new Roaring64Bitmap()
      bm.deserialize(new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(vec)))
      bm
    } finally raf.close()
  }

  /** Footer-driven listing of every blob in a puffin file (completeness /
    * inspection path; scans use direct access via manifest/statistics
    * metadata offsets). */
  def listBlobs(path: String): Seq[BlobRef] = {
    val raf = new RandomAccessFile(path, "r")
    try {
      val len = raf.length()
      raf.seek(len - 8)
      val tail = new Array[Byte](8)
      raf.readFully(tail)
      require(tail.slice(4, 8).sameElements(FileMagic), s"not a puffin file: $path")
      raf.seek(len - 12)
      val szBytes = new Array[Byte](4)
      raf.readFully(szBytes)
      val payloadSize = (szBytes(0) & 0xff) | ((szBytes(1) & 0xff) << 8) |
        ((szBytes(2) & 0xff) << 16) | ((szBytes(3) & 0xff) << 24)
      require((tail(0) & 1) == 0, "compressed puffin footers not supported")
      val payload = new Array[Byte](payloadSize)
      raf.seek(len - 12 - payloadSize)
      raf.readFully(payload)
      val root = new ObjectMapper().readTree(new String(payload, StandardCharsets.UTF_8))
      val blobs = root.get("blobs")
      (0 until blobs.size()).map { i =>
        val b = blobs.get(i)
        val props = b.get("properties")
        import scala.jdk.CollectionConverters._
        BlobRef(
          b.get("type").asText(),
          b.get("offset").asLong(),
          b.get("length").asLong(),
          Option(b.get("fields")).map(f =>
            (0 until f.size()).map(f.get(_).asInt()): Seq[Int]).getOrElse(Nil),
          Option(b.get("snapshot-id")).map(_.asLong()).getOrElse(-1L),
          Option(b.get("sequence-number")).map(_.asLong()).getOrElse(-1L),
          Option(props).map(_.properties().asScala.map(e =>
            e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty))
      }
    } finally raf.close()
  }

  /** Footer listing narrowed to deletion-vector blobs. */
  def listDVBlobs(path: String): Seq[DVRef] =
    listBlobs(path).filter(_.blobType == DVBlobType).map(r =>
      DVRef(r.properties("referenced-data-file"), r.offset, r.length,
        r.properties("cardinality").toLong))

  /** Direct-access read of a blob's raw bytes (statistics sketches). */
  def readBlob(path: String, offset: Long, length: Long): Array[Byte] = {
    val raf = new RandomAccessFile(path, "r")
    try {
      raf.seek(offset)
      val b = new Array[Byte](length.toInt)
      raf.readFully(b)
      b
    } finally raf.close()
  }
}
