package graft.ice.io

import java.io.OutputStream
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.avro.file.{SeekableFileInput, SeekableInput}

/** Pluggable file IO for the METADATA plane (S15) — the reference's
  * `FileIO` seam (file_io.h): metadata JSON, manifests, and manifest
  * lists go through one swappable interface, so an object-store backend
  * is one implementation away. The DATA plane deliberately does NOT go
  * through this: data files are read/written by Spark's distributed
  * sources (parquet/avro readers on executors), where a driver-side
  * byte-stream interface would be the scale bug.
  *
  * Avro-shaped accessors (`newInput`/`newOutput`) exist because
  * manifests are Avro object-container files needing seekable reads;
  * `readBytes`/`writeAtomic` serve the (small) metadata JSON. */
trait FileIO {
  /** Seekable handle for Avro container reads. */
  def newInput(path: String): SeekableInput
  /** Overwriting output stream; creates parent directories. */
  def newOutput(path: String): OutputStream
  def readBytes(path: String): Array[Byte]
  /** Full-file atomic replace (commit safety: readers never observe a
    * torn metadata file). */
  def writeAtomic(path: String, bytes: Array[Byte]): Unit
  /** Atomically publish a fully-written staged file onto `dst`,
    * replacing any existing file — the task-commit primitive (executor
    * retries/speculation must never expose a torn file). Local: rename;
    * object store: copy-then-delete is acceptable because `src` is
    * already complete and `dst` replacement is last-writer-wins. */
  def atomicSwap(src: String, dst: String): Unit
  /** First-committer-wins publish: write `bytes` at `path` ONLY if no
    * file exists there, atomically; returns false when a concurrent
    * writer got there first. THE metadata-commit primitive — local FS
    * arbitrates via hard-link create-new semantics, an object store via
    * conditional put (If-None-Match), a database via INSERT. Every
    * commit race in the engine reduces to this one call. */
  def writeIfAbsent(path: String, bytes: Array[Byte]): Boolean
  def delete(path: String): Unit
  def exists(path: String): Boolean
  def length(path: String): Long
}

/** Local-filesystem FileIO (the default everywhere). */
object LocalFileIO extends FileIO {
  private def p(path: String) = Paths.get(path)
  override def newInput(path: String): SeekableInput =
    new SeekableFileInput(new java.io.File(path))
  override def newOutput(path: String): OutputStream = {
    Option(p(path).getParent).foreach(Files.createDirectories(_))
    Files.newOutputStream(p(path))
  }
  override def readBytes(path: String): Array[Byte] = Files.readAllBytes(p(path))
  override def writeAtomic(path: String, bytes: Array[Byte]): Unit = {
    val target = p(path)
    Option(target.getParent).foreach(Files.createDirectories(_))
    val tmp = Files.createTempFile(target.getParent, ".tmp-io", ".bin")
    Files.write(tmp, bytes)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
  }
  override def atomicSwap(src: String, dst: String): Unit =
    Files.move(p(src), p(dst), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  override def writeIfAbsent(path: String, bytes: Array[Byte]): Boolean = {
    val target = p(path)
    Option(target.getParent).foreach(Files.createDirectories(_))
    val tmp = Files.createTempFile(target.getParent, ".tmp-io", ".bin")
    Files.write(tmp, bytes)
    // POSIX rename silently REPLACES an existing target, so ATOMIC_MOVE
    // cannot arbitrate the race; a hard link is atomic, publishes the
    // fully-written content, and fails if the target exists
    try { Files.createLink(target, tmp); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
    finally Files.deleteIfExists(tmp)
  }
  override def delete(path: String): Unit = Files.deleteIfExists(p(path))
  override def exists(path: String): Boolean = Files.exists(p(path))
  override def length(path: String): Long = Files.size(p(path))
}

/** FileIO over `org.apache.hadoop.fs.FileSystem` — the object-store
  * bridge (reference: arrow_fs_file_io.cc wraps any Arrow filesystem
  * the same way). Whatever filesystems the cluster's Hadoop conf knows
  * (hdfs://, s3a://, gs://, file://) serve the metadata plane through
  * this one class; the data plane already rides Spark's own Hadoop IO.
  *
  * Commit-primitive semantics are the FILESYSTEM's:
  *  - `writeIfAbsent` maps to `create(overwrite=false)` — atomic
  *    first-writer-wins on HDFS; on S3A it is conditional-put only when
  *    the store supports it (S3 added If-None-Match puts; enable
  *    `fs.s3a.create.conditional.enabled`).
  *  - `writeAtomic`/`atomicSwap` map to temp-write + single-step
  *    rename-with-overwrite (FileContext OVERWRITE) — atomic on HDFS
  *    with no delete window; copy-on-rename stores keep the torn-read
  *    guard because the temp file is complete before the rename
  *    starts. */
final class HadoopFileIO(conf: org.apache.hadoop.conf.Configuration) extends FileIO {
  import org.apache.hadoop.fs.{FileSystem, Path => HPath}

  private def fs(p: HPath): FileSystem = p.getFileSystem(conf)
  private def hp(path: String): HPath = new HPath(path)

  override def newInput(path: String): SeekableInput = {
    val p = hp(path)
    val f = fs(p)
    val len = f.getFileStatus(p).getLen
    val in = f.open(p)
    new SeekableInput {
      override def length(): Long = len
      override def seek(pos: Long): Unit = in.seek(pos)
      override def tell(): Long = in.getPos
      override def read(b: Array[Byte], off: Int, n: Int): Int = in.read(b, off, n)
      override def close(): Unit = in.close()
    }
  }
  override def newOutput(path: String): OutputStream = {
    val p = hp(path)
    fs(p).create(p, true)
  }
  override def readBytes(path: String): Array[Byte] = {
    val p = hp(path)
    val f = fs(p)
    val len = f.getFileStatus(p).getLen.toInt
    val in = f.open(p)
    try { val b = new Array[Byte](len); in.readFully(0, b); b }
    finally in.close()
  }
  /** Single-step rename-with-overwrite via FileContext — atomic on HDFS
    * (no delete window: a concurrent reader sees old or new, never
    * missing, and a crash cannot lose the target). Only when the scheme
    * has no AbstractFileSystem binding does this degrade to
    * delete-then-rename, which is torn-read-safe but NOT crash-safe in
    * the window — commit correctness never rests on it (that is
    * writeIfAbsent's job). */
  private def renameOverwrite(src: HPath, dst: HPath): Unit =
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, conf)
      fc.rename(src, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        val f = fs(dst)
        if (f.exists(dst)) f.delete(dst, false)
        if (!f.rename(src, dst))
          throw new java.io.IOException(s"rename $src -> $dst failed")
    }

  override def writeAtomic(path: String, bytes: Array[Byte]): Unit = {
    val target = hp(path)
    val f = fs(target)
    val tmp = new HPath(target.getParent,
      s".tmp-${java.util.UUID.randomUUID()}-${target.getName}")
    val out = f.create(tmp, true)
    try out.write(bytes) finally out.close()
    renameOverwrite(tmp, target)
  }
  override def atomicSwap(src: String, dst: String): Unit =
    renameOverwrite(hp(src), hp(dst))
  override def writeIfAbsent(path: String, bytes: Array[Byte]): Boolean = {
    val p = hp(path)
    val f = fs(p)
    Option(p.getParent).foreach(f.mkdirs(_))
    val out =
      try f.create(p, false)
      catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException |
                   _: java.io.IOException if f.exists(p) => return false }
    try { out.write(bytes); out.close(); true }
    catch { case e: Throwable => try out.close() catch { case _: Throwable => () }; throw e }
  }
  override def delete(path: String): Unit = { fs(hp(path)).delete(hp(path), false); () }
  override def exists(path: String): Boolean = fs(hp(path)).exists(hp(path))
  override def length(path: String): Long = fs(hp(path)).getFileStatus(hp(path)).getLen
}

/** Map-backed FileIO proving the metadata plane is fully abstracted
  * (used by FileIOSpec; an S3/GCS impl would slot in the same way). */
final class InMemoryFileIO extends FileIO {
  private val store = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
  private def get(path: String): Array[Byte] = {
    val b = store.get(path)
    if (b == null) throw new java.io.FileNotFoundException(path)
    b
  }
  override def newInput(path: String): SeekableInput =
    new org.apache.avro.file.SeekableByteArrayInput(get(path))
  override def newOutput(path: String): OutputStream =
    new java.io.ByteArrayOutputStream() {
      override def close(): Unit = { super.close(); store.put(path, toByteArray) }
    }
  override def readBytes(path: String): Array[Byte] = get(path)
  override def writeAtomic(path: String, bytes: Array[Byte]): Unit = store.put(path, bytes)
  override def atomicSwap(src: String, dst: String): Unit = {
    store.put(dst, get(src)); store.remove(src); ()
  }
  override def writeIfAbsent(path: String, bytes: Array[Byte]): Boolean =
    store.putIfAbsent(path, bytes) == null
  override def delete(path: String): Unit = store.remove(path)
  override def exists(path: String): Boolean = store.containsKey(path)
  override def length(path: String): Long = get(path).length.toLong
  def paths: Set[String] = { import scala.jdk.CollectionConverters._; store.keySet.asScala.toSet }
}
