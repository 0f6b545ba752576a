package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §2.11): image/audio/video payloads
  * travel as opaque `binary` columns with a typed metadata struct; decode
  * / feature-extraction runs as a partition-wise batch transform.
  *
  * Image decode is REAL: `javax.imageio` (JDK-builtin; PNG/GIF/BMP)
  * decodes payloads executor-side and the features are pooled from the
  * decoded raster. Payloads that are not a decodable image fall back to
  * a deterministic byte-derived pseudo-feature (`stubDecode`) so the
  * stage is total — the production shape for a corpus where a fraction
  * of blobs is always corrupt. Video/audio codecs don't exist in the
  * JDK; those stages remain deterministic stand-ins with the real batch
  * shape (one row in, n frame rows out). */
object Multimodal {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("n_bytes", LongType, nullable = false),
    StructField("magic", StringType)))

  val featureType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Attach a binary payload column + typed metadata from any source
    * column (for the testdata, documents.text bytes stand in for media). */
  def asMedia(df: DataFrame, srcCol: String): DataFrame =
    df.withColumn("payload", encode(col(srcCol), "UTF-8"))
      .withColumn("media_meta", struct(
        lit("application/octet-stream").as("mime"),
        length(col("payload")).cast("long").as("n_bytes"),
        hex(substring(col("payload"), 1, 4)).as("magic")))

  /** STUB decode: deterministic pseudo-features from bytes. A real
    * implementation would decode the image and pool pixel features; the
    * signature (bytes -> fixed-width struct) is what the pipeline relies
    * on. Runs per-partition over grouped batches, mirroring a
    * mapInPandas/Arrow-batch deployment. */
  private def stubDecode(bytes: Array[Byte]): (Int, Int, Array[Double]) = {
    if (bytes == null || bytes.isEmpty) return (0, 0, Array.fill(8)(0.0))
    val width = 1 + (math.abs(bytes.head.toInt) % 64)
    val height = 1 + (math.abs(bytes.last.toInt) % 64)
    // 8 "pooled" features: mean byte value per 1/8th slice
    val features = Array.tabulate(8) { i =>
      val start = i * bytes.length / 8
      val end = math.max(start + 1, (i + 1) * bytes.length / 8)
      val slice = bytes.slice(start, end)
      slice.map(b => (b & 0xff).toDouble).sum / slice.length
    }
    (width, height, features)
  }

  final case class MediaIn(id: Long, payload: Array[Byte])
  final case class MediaFeatures(id: Long, width: Int, height: Int,
      features: Array[Double])

  /** Deterministic synthetic image: a w×h grayscale raster whose pixel
    * (x,y) luminance is the CLOSED FORM `(7x + 13y + 31·id) mod 256`,
    * PNG-encoded with `javax.imageio`. Because PNG is lossless and the
    * formula is arithmetic, an independent engine (the DuckDB oracle)
    * can recompute the pooled features without ever decoding a byte —
    * the decode path is verified end-to-end against a party that never
    * saw the image. */
  def syntheticImageDims(id: Long): (Int, Int) =
    (8 + (id % 24).toInt, 8 + ((id / 7) % 24).toInt)

  def syntheticImagePng(id: Long): Array[Byte] = {
    val (w, h) = syntheticImageDims(id)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((7L * x + 13L * y + 31L * id) % 256L).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Render the synthetic PNG payload per id — executor-side encode via
    * the same typed-Dataset batch shape as [[extractFeatures]]. */
  def asRenderedMedia(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"))
      .as[Long]
      .mapPartitions(_.map(id => MediaIn(id, syntheticImagePng(id))))
      .toDF("id", "payload")
      .withColumnRenamed("id", idCol)
      .withColumn("media_meta", struct(
        lit("image/png").as("mime"),
        length(col("payload")).cast("long").as("n_bytes"),
        hex(substring(col("payload"), 1, 4)).as("magic")))
  }

  /** Real image decode via `javax.imageio` (PNG/GIF/BMP ship in the
    * JDK). Returns None when the payload is not a decodable image —
    * callers fall back to [[stubDecode]]. Features: mean luminance per
    * horizontal 1/8th band (row y belongs to band y*8/h), luminance =
    * the single gray band or the mean of the first three bands. */
  private[graft] def imageDecode(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    if (bytes == null || bytes.length < 8) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return None
    val (w, h) = (img.getWidth, img.getHeight)
    if (w == 0 || h == 0) return None
    val raster = img.getRaster
    val nb = math.min(raster.getNumBands, 3)
    val sums = Array.fill(8)(0L)
    val counts = Array.fill(8)(0L)
    var y = 0
    while (y < h) {
      val band = y * 8 / h
      var x = 0
      while (x < w) {
        var s = 0L
        var b = 0
        while (b < nb) { s += raster.getSample(x, y, b); b += 1 }
        sums(band) += s / nb
        counts(band) += 1
        x += 1
      }
      y += 1
    }
    val features = Array.tabulate(8)(i =>
      if (counts(i) == 0) 0.0 else sums(i).toDouble / counts(i))
    Some((w, h, features))
  }

  /** Partition-wise decode/feature-extract over the payload column.
    * Only (id, payload) flow into this stage — prune other columns
    * upstream and join features back by id, so the wide decode stage
    * never shuffles full rows.
    *
    * Typed Dataset.mapPartitions with case-class encoders: rows stay in
    * Tungsten binary form at the stage boundary (no Row boxing, no
    * schema-at-runtime RDD bridge) — the JVM-native analogue of the
    * mapInPandas/Arrow-batch deployment this stands in for. */
  def extractFeatures(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col("payload"))
      .as[MediaIn]
      .mapPartitions(_.map { m =>
        val (w, h, f) = imageDecode(m.payload).getOrElse(stubDecode(m.payload))
        MediaFeatures(m.id, w, h, f)
      })
      .toDF("id", "width", "height", "features")
      .withColumnRenamed("id", idCol)
  }

  /** Resize stub: deterministic byte-truncation standing in for a pixel
    * resample — the real shape is payload -> payload with new dims. Pure
    * column expressions, map-only. */
  def resize(df: DataFrame, idCol: String, targetW: Int, targetH: Int): DataFrame =
    df.select(col(idCol),
      lit(targetW).as("width"), lit(targetH).as("height"),
      substring(col("payload"), 1, targetW * targetH).as("payload_resized"))
      .withColumn("n_bytes_resized", length(col("payload_resized")).cast("long"))

  /** Frame-sampling stub for video-like payloads: fixed-stride byte
    * windows standing in for decoded frames (same batch shape as real
    * frame extraction: one row in, n frame rows out). */
  def sampleFrames(df: DataFrame, idCol: String, nFrames: Int = 4): DataFrame =
    df.select(col(idCol), col("payload"),
      posexplode(transform(sequence(lit(0), lit(nFrames - 1)),
        i => substring_index(base64(col("payload")), "=", 1))).as(Seq("frame_idx", "frame_stub")))
      .select(col(idCol), col("frame_idx"),
        xxhash64(col("frame_stub"), col("frame_idx")).as("frame_fingerprint"))
}
