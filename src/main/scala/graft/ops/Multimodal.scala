package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §2.11): image/audio/video payloads
  * travel as opaque `binary` columns with a typed metadata struct; decode
  * / feature-extraction runs as a partition-wise batch transform.
  *
  * Image decode (mm2), resize (mm3), and frame sampling (mm4) are REAL:
  * `javax.imageio` (JDK-builtin; PNG/GIF/BMP) decodes payloads
  * executor-side; resize is a nearest-neighbor pixel resample re-encoded
  * to PNG and re-decoded before pooling; frame sampling decodes
  * multi-frame GIF containers and pools per kept frame. Payloads that
  * are not a decodable image fall back to a deterministic byte-derived
  * pseudo-feature (`stubDecode`) or contribute no frames, so every stage
  * is total — the production shape for a corpus where a fraction of
  * blobs is always corrupt. Audio decode (mm5) is real too: WAV parses
  * via `javax.sound.sampled` (also JDK-builtin) with windowed PCM
  * amplitude pooling. */
object Multimodal {

  // ImageIO defaults to an ON-DISK stream cache: every read/write spins
  // up a temp file under java.io.tmpdir, which serializes a 32-task
  // decode stage on file create/delete churn (measured: 2-4x slowdown
  // once the render stages went parallel). All payloads here are
  // in-memory byte arrays — cache in memory. Object init runs once per
  // JVM (driver and each executor) before any method is used.
  javax.imageio.ImageIO.setUseCache(false)

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
    // Par.ensure BEFORE the render: the id projection inherits the source
    // scan's split count (often 1-2 small parquet splits for a fixture
    // slice), and an un-repartitioned render pins a 32-core stage to one
    // task. The shuffle moves only ids — payload bytes are created on
    // the executors AFTER it.
    Par.ensure(df.select(col(idCol).cast("long").as("id")))
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

  /** Row-major luminance plane of a decoded image, color-model aware.
    * Two traps make a naive per-pixel accessor wrong (and slow) across
    * the fixture formats:
    *  - indexed images (GIF): `raster.getSample` returns the PALETTE
    *    INDEX, not a luminance — resolve through the palette (which
    *    stores the raw 0..255 gray as an sRGB triple, so the low byte
    *    is exact). The palette is materialized ONCE as a lookup table;
    *    per-pixel `getRGB` would re-run color-model resolution 150M+
    *    times over a 20k-image fixture.
    *  - component images (gray PNG): `getRGB` routes through the
    *    CS_GRAY -> sRGB color transform, which applies a gamma curve
    *    and CHANGES the value — read the raw sample(s) directly
    *    (mean of the first <=3 bands, as [[imageDecode]] does). */
  private def lumPlane(img: java.awt.image.BufferedImage): Array[Int] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Int](w * h)
    val raster = img.getRaster
    img.getColorModel match {
      case icm: java.awt.image.IndexColorModel =>
        val pal = new Array[Int](icm.getMapSize)
        icm.getRGBs(pal)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            out(y * w + x) = pal(raster.getSample(x, y, 0)) & 0xff
            x += 1
          }
          y += 1
        }
      case _ =>
        val nb = math.min(raster.getNumBands, 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var s = 0; var b = 0
            while (b < nb) { s += raster.getSample(x, y, b); b += 1 }
            out(y * w + x) = s / nb
            x += 1
          }
          y += 1
        }
    }
    out
  }

  /** Mean luminance per horizontal 1/8th band (row y belongs to band
    * y*8/h) — the same pooling as [[imageDecode]], but palette-safe. */
  private def poolBands(img: java.awt.image.BufferedImage): Array[Double] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val plane = lumPlane(img)
    val sums = Array.fill(8)(0L)
    val counts = Array.fill(8)(0L)
    var y = 0
    while (y < h) {
      val band = y * 8 / h
      var x = 0
      while (x < w) { sums(band) += plane(y * w + x); counts(band) += 1; x += 1 }
      y += 1
    }
    Array.tabulate(8)(i => if (counts(i) == 0) 0.0 else sums(i).toDouble / counts(i))
  }

  /** Nearest-neighbor resample to (tw, th): output pixel (X,Y) samples
    * input pixel (floor(X·w/tw), floor(Y·h/th)). The mapping is written
    * out (not delegated to Graphics2D) because the FLOOR form is the
    * closed form an independent oracle recomputes — AWT's scaler makes
    * no contract about its sample positions. */
  private[graft] def resampleNearest(img: java.awt.image.BufferedImage,
      tw: Int, th: Int): java.awt.image.BufferedImage = {
    val (w, h) = (img.getWidth, img.getHeight)
    val plane = lumPlane(img)
    val out = new java.awt.image.BufferedImage(tw, th,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = out.getRaster
    val row = new Array[Int](tw)
    var y = 0
    while (y < th) {
      val sy = (y.toLong * h / th).toInt
      var x = 0
      while (x < tw) {
        row(x) = plane(sy * w + (x.toLong * w / tw).toInt)
        x += 1
      }
      raster.setSamples(0, y, tw, 1, 0, row)
      y += 1
    }
    out
  }

  final case class ResizedMedia(id: Long, width: Int, height: Int,
      features: Array[Double], payload_resized: Array[Byte])

  /** REAL image resize (mm3): decode the payload (`javax.imageio`),
    * nearest-neighbor resample to (targetW, targetH), re-encode as PNG,
    * then RE-DECODE the re-encoded payload and pool band features from
    * it — the emitted features prove `payload_resized` is a genuine
    * decodable image of the target dims, not just that the resample ran
    * in memory. Undecodable payloads fall back to the deterministic
    * byte stub so the stage stays total (corrupt blobs exist in every
    * real corpus). Partition-wise typed Dataset stage, same batch shape
    * as [[extractFeatures]]; only (id, payload) flow through it. */
  def resize(spark: SparkSession, df: DataFrame, idCol: String,
      targetW: Int, targetH: Int): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col("payload"))
      .as[MediaIn]
      .mapPartitions(_.map { m =>
        val decoded =
          if (m.payload == null || m.payload.length < 8) None
          else try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(m.payload)))
          catch { case _: Exception => None }
        decoded match {
          case Some(img) if img.getWidth > 0 && img.getHeight > 0 =>
            val resized = resampleNearest(img, targetW, targetH)
            val out = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(resized, "png", out)
            val png = out.toByteArray
            val back = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(png))
            ResizedMedia(m.id, back.getWidth, back.getHeight,
              poolBands(back), png)
          case _ =>
            val (_, _, f) = stubDecode(m.payload)
            ResizedMedia(m.id, targetW, targetH, f, Array.empty[Byte])
        }
      })
      .toDF("id", "width", "height", "features", "payload_resized")
      .withColumnRenamed("id", idCol)
  }

  /** Deterministic synthetic "video": an animated GIF of `nFrames`
    * frames whose frame-k pixel luminance is the CLOSED FORM
    * `(7x + 13y + 31·id + 17·k) mod 256` at the same per-id dims as
    * [[syntheticImagePng]]. GIF is lossless for ≤256 gray levels, so an
    * independent engine recomputes any frame's pooled features from the
    * formula without parsing a GIF byte. */
  def syntheticVideoGif(id: Long, nFrames: Int): Array[Byte] = {
    val (w, h) = syntheticImageDims(id)
    val out = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var k = 0
    while (k < nFrames) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0,
            ((7L * x + 13L * y + 31L * id + 17L * k) % 256L).toInt)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      k += 1
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    out.toByteArray
  }

  /** Render the synthetic multi-frame GIF payload per id (executor-side,
    * same typed batch shape as [[asRenderedMedia]]). */
  def asRenderedVideo(spark: SparkSession, df: DataFrame, idCol: String,
      nFrames: Int = 8): DataFrame = {
    import spark.implicits._
    Par.ensure(df.select(col(idCol).cast("long").as("id"))) // see asRenderedMedia
      .as[Long]
      .mapPartitions(_.map(id => MediaIn(id, syntheticVideoGif(id, nFrames))))
      .toDF("id", "payload")
      .withColumnRenamed("id", idCol)
      .withColumn("media_meta", struct(
        lit("image/gif").as("mime"),
        length(col("payload")).cast("long").as("n_bytes"),
        hex(substring(col("payload"), 1, 4)).as("magic")))
  }

  // ---------- audio (mm5) ----------

  /** Per-id sample count for the synthetic audio fixture (8 kHz mono
    * 16-bit PCM; ~quarter-second clips). */
  def syntheticAudioSamples(id: Long): Int = 2000 + (id % 1000).toInt

  /** Deterministic synthetic audio: `n` little-endian int16 PCM samples
    * with the CLOSED FORM `s_k = ((31·id + 7·k) mod 65536) - 32768`,
    * wrapped as a WAV container by `javax.sound.sampled` (WAV ships in
    * the JDK). PCM in WAV is lossless, so an independent engine
    * recomputes any windowed amplitude statistic from the formula
    * without parsing a WAV byte. */
  /** The WAV reader/writer SPI providers, resolved ONCE per JVM.
    * `AudioSystem.write`/`getAudioInputStream` walk the FULL provider
    * registry per call — and the JDK's registry includes a MIDI-backed
    * AudioFileReader whose rejection probe takes a CLASS-level lock
    * (com.sun.media.sound.JSSecurityManager.getProviders), so a 32-core
    * decode stage serializes on it: a 20k-clip render+decode measured
    * 5.06 s at 32 threads through AudioSystem vs 0.29 s warm with the
    * providers pinned (the r18 fix). The SAME JDK WaveFileWriter /
    * WaveFileReader classes still produce and parse every byte — output
    * is byte-identical (spec-pinned) — only the per-call registry walk
    * is gone. Either field is null when probing fails (exotic JDK);
    * callers then fall back to the AudioSystem path. */
  private lazy val wavProviders: (javax.sound.sampled.spi.AudioFileWriter,
      javax.sound.sampled.spi.AudioFileReader) = {
    import javax.sound.sampled._
    try {
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      def probeStream() = new AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](4)), fmt, 2L)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(probeStream(), AudioFileFormat.Type.WAVE, out)
      val wav = out.toByteArray
      import scala.jdk.CollectionConverters._
      val writer = java.util.ServiceLoader
        .load(classOf[spi.AudioFileWriter]).asScala
        .find(_.isFileTypeSupported(AudioFileFormat.Type.WAVE, probeStream()))
        .orNull
      val reader = java.util.ServiceLoader
        .load(classOf[spi.AudioFileReader]).asScala
        .find { r =>
          try { r.getAudioInputStream(new java.io.ByteArrayInputStream(wav)); true }
          catch { case _: Exception => false }
        }.orNull
      (writer, reader)
    } catch { case _: Throwable => (null, null) }
  }

  def syntheticAudioWav(id: Long): Array[Byte] = {
    val n = syntheticAudioSamples(id)
    val pcm = new Array[Byte](n * 2)
    var k = 0
    while (k < n) {
      val s = ((31L * id + 7L * k) % 65536L).toInt - 32768
      pcm(2 * k) = (s & 0xff).toByte
      pcm(2 * k + 1) = ((s >> 8) & 0xff).toByte
      k += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    wavProviders._1 match {
      case null => javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      case w => w.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    }
    out.toByteArray
  }

  /** Render the synthetic WAV payload per id (executor-side, same typed
    * batch shape as [[asRenderedMedia]]). */
  def asRenderedAudio(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    Par.ensure(df.select(col(idCol).cast("long").as("id"))) // see asRenderedMedia
      .as[Long]
      .mapPartitions(_.map(id => MediaIn(id, syntheticAudioWav(id))))
      .toDF("id", "payload")
      .withColumnRenamed("id", idCol)
      .withColumn("media_meta", struct(
        lit("audio/wav").as("mime"),
        length(col("payload")).cast("long").as("n_bytes"),
        hex(substring(col("payload"), 1, 4)).as("magic")))
  }

  final case class AudioFeatures(id: Long, sample_rate: Int,
      n_samples: Long, features: Array[Double])

  /** REAL audio decode (mm5): `javax.sound.sampled` parses the WAV
    * container, the PCM stream is windowed into 8 equal spans (sample k
    * belongs to window k*8/n) and each window's mean ABSOLUTE amplitude
    * is emitted — integer sums over exact int16 samples, so the oracle's
    * closed-form recompute matches bit-for-bit. Non-PCM/undecodable
    * payloads emit a zeroed row (total stage; corrupt blobs exist in
    * every real corpus). */
  def audioFeatures(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col("payload"))
      .as[MediaIn]
      .mapPartitions(_.map { m =>
        val decoded =
          if (m.payload == null || m.payload.length < 12) None
          else try {
            // pinned WAV reader (see wavProviders); a payload the WAV
            // parser rejects falls back to the full AudioSystem registry
            // walk, so non-WAV-but-decodable payloads behave exactly as
            // before — only the hot all-WAV path skips the registry
            val ais = wavProviders._2 match {
              case null => javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(m.payload))
              case r =>
                try r.getAudioInputStream(new java.io.ByteArrayInputStream(m.payload))
                catch { case _: Exception =>
                  javax.sound.sampled.AudioSystem.getAudioInputStream(
                    new java.io.ByteArrayInputStream(m.payload))
                }
            }
            val fmt = ais.getFormat
            if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
                fmt.isBigEndian) None
            else {
              val bytes = ais.readAllBytes()
              val n = bytes.length / 2
              val sums = Array.fill(8)(0L)
              val counts = Array.fill(8)(0L)
              var k = 0
              while (k < n) {
                val s = ((bytes(2 * k + 1).toInt << 8) |
                  (bytes(2 * k) & 0xff)).toShort.toInt
                val w = k * 8 / n
                sums(w) += math.abs(s); counts(w) += 1
                k += 1
              }
              Some(AudioFeatures(m.id, fmt.getSampleRate.toInt, n.toLong,
                Array.tabulate(8)(i =>
                  if (counts(i) == 0) 0.0 else sums(i).toDouble / counts(i))))
            }
          } catch { case _: Exception => None }
        decoded.getOrElse(AudioFeatures(m.id, 0, 0L, Array.fill(8)(0.0)))
      })
      .toDF("id", "sample_rate", "n_samples", "features")
      .withColumnRenamed("id", idCol)
  }

  final case class FrameFeatures(id: Long, frame_idx: Int, width: Int,
      height: Int, features: Array[Double])

  /** REAL frame sampling (mm4): decode the multi-frame container with
    * `javax.imageio` (GIF ships in the JDK), keep every `stride`-th
    * frame, and pool band features per kept frame — one row in, one row
    * per sampled frame out, the batch shape of a video pipeline's frame
    * extractor. Undecodable payloads yield no frames (a corrupt video
    * contributes nothing rather than poisoning the stage). */
  def sampleFrames(spark: SparkSession, df: DataFrame, idCol: String,
      stride: Int = 2): DataFrame = {
    import spark.implicits._
    require(stride >= 1, s"stride must be >= 1, got $stride")
    df.select(col(idCol).cast("long").as("id"), col("payload"))
      .as[MediaIn]
      .mapPartitions(_.flatMap { m =>
        if (m.payload == null || m.payload.length < 8) Iterator.empty
        else {
          val frames =
            try {
              val iis = javax.imageio.ImageIO.createImageInputStream(
                new java.io.ByteArrayInputStream(m.payload))
              val readers = javax.imageio.ImageIO.getImageReaders(iis)
              if (!readers.hasNext) Iterator.empty
              else {
                val reader = readers.next()
                reader.setInput(iis)
                val n = reader.getNumImages(true)
                val rows = (0 until n by stride).iterator.map { k =>
                  val f = reader.read(k)
                  FrameFeatures(m.id, k, f.getWidth, f.getHeight, poolBands(f))
                }.toVector // materialize before the reader is disposed
                reader.dispose()
                rows.iterator
              }
            } catch { case _: Exception => Iterator.empty }
          frames
        }
      })
      .toDF("id", "frame_idx", "width", "height", "features")
      .withColumnRenamed("id", idCol)
  }
}
