package graft.ice.catalog

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import graft.ice.meta._
import graft.ice.types.Schema

final case class TableIdentifier(namespace: Seq[String], name: String) {
  override def toString: String = (namespace :+ name).mkString(".")
}
object TableIdentifier {
  def parse(s: String): TableIdentifier = {
    val parts = s.split('.')
    TableIdentifier(parts.init.toSeq, parts.last)
  }
}

class CommitFailedException(msg: String) extends RuntimeException(msg)

/** A commit attempt whose OUTCOME is unknown (REST timeout, FS write
  * exception after bytes may have landed): neither success nor clean
  * failure. Blind-retrying one of these can double-commit — a retry
  * after an actually-succeeded attempt re-validates requirements against
  * a base that now contains the attempt and surfaces as a spurious
  * conflict (or worse, re-appends). IceTable.commit reconciles these
  * through the `commit.status-check.*` polling protocol
  * (table_properties.h:86-93) before deciding. */
class CommitStateUnknownException(msg: String, val attemptedVersion: Int,
    cause: Throwable = null) extends RuntimeException(msg, cause)
class NoSuchTableException(msg: String) extends RuntimeException(msg)
class AlreadyExistsException(msg: String) extends RuntimeException(msg)

class NoSuchNamespaceException(msg: String) extends RuntimeException(msg)

/** Catalog interface (reference: src/iceberg/catalog.h:39-236). */
trait Catalog {
  def createTable(ident: TableIdentifier, schema: Schema,
      spec: PartitionSpec = PartitionSpec.unpartitioned,
      sortOrder: SortOrder = SortOrder.unsorted,
      properties: Map[String, String] = Map.empty,
      location: Option[String] = None): TableRef
  def loadTable(ident: TableIdentifier): TableRef
  def tableExists(ident: TableIdentifier): Boolean
  def dropTable(ident: TableIdentifier, purge: Boolean = false): Boolean
  def listTables(namespace: Seq[String]): Seq[TableIdentifier]
  /** Child namespaces of `parent` (catalog.h:64-112); Nil parent = roots. */
  def listNamespaces(parent: Seq[String] = Nil): Seq[Seq[String]]
  def createNamespace(namespace: Seq[String],
      properties: Map[String, String] = Map.empty): Unit
  def dropNamespace(namespace: Seq[String]): Boolean
  def namespaceExists(namespace: Seq[String]): Boolean
  def loadNamespaceProperties(namespace: Seq[String]): Map[String, String]
  def updateNamespaceProperties(namespace: Seq[String],
      updates: Map[String, String], removals: Set[String] = Set.empty): Unit
  def registerTable(ident: TableIdentifier, metadataLocation: String): TableRef
  /** Optimistic swap: commit `updated` iff the table's current metadata
    * file is still `baseVersion`. Throws CommitFailedException otherwise. */
  def commit(ident: TableIdentifier, baseVersion: Int, updated: TableMetadata): Int
  def currentVersion(ident: TableIdentifier): Int

  /** `commit.status-check` probe: did the attempt that tried to publish
    * `attempted` at `attemptedVersion` LAND? Some(true) = it is durable,
    * adopt it; Some(false) = it provably did not land at probe time and
    * nothing in this catalog lands asynchronously after its commit call
    * returned/threw, so a refresh+retry is safe; None = cannot tell.
    * `base` is the PRE-attempt metadata the update was built from —
    * probes that reason about snapshot ids must only trust ids the
    * attempt newly minted (attempted minus base), never ids the base
    * already carried, or a snapshot-free/snapshot-removing attempt
    * would be falsely adopted as landed (phantom commit).
    * The default can only prove the negative (version not reached). */
  def commitLanded(ident: TableIdentifier, attemptedVersion: Int,
      attempted: TableMetadata, base: TableMetadata): Option[Boolean] =
    if (currentVersion(ident) < attemptedVersion) Some(false) else None

  /** Physical location of the current metadata file, when the catalog
    * stores one (REST LoadTableResult.metadata_location; None for
    * catalogs that only hold metadata in memory). */
  def metadataLocation(ident: TableIdentifier): Option[String] = None

  /** Rename a table (REST RenameTableRequest, types.h:68-72). Optional:
    * catalogs whose identity is coupled to the storage path — like this
    * repo's DirCatalog and the public HadoopCatalog it mirrors — cannot
    * rename without breaking absolute manifest paths, and refuse loudly
    * rather than corrupt; pointer-based catalogs can override. */
  def renameTable(source: TableIdentifier, destination: TableIdentifier): Unit =
    throw new UnsupportedOperationException(
      s"$getClass does not support renameTable ($source -> $destination): " +
        "table identity is coupled to the storage path")

  /** Stage a table creation (catalog.h:144-149 StageCreateTable): build
    * the initial metadata WITHOUT publishing it. The returned ref has
    * version 0; the first `commit(ident, 0, …)` publishes v1 atomically,
    * first-committer-wins against any concurrent create. */
  def stageCreateTable(ident: TableIdentifier, schema: Schema,
      spec: PartitionSpec = PartitionSpec.unpartitioned,
      sortOrder: SortOrder = SortOrder.unsorted,
      properties: Map[String, String] = Map.empty,
      location: Option[String] = None): TableRef

  /** Fluent table builder (catalog.h:157-236). */
  def buildTable(ident: TableIdentifier, schema: Schema): TableBuilder =
    new TableBuilder(this, ident, schema)
}

/** TableBuilder (catalog.h:157-236): collect spec / sort order / location
  * / properties, then `create()` (immediate publish) or `stageCreate()`
  * (invisible until the returned transaction commits — the CTAS pattern:
  * stage, write data through the staged handle, commit once). */
final class TableBuilder(catalog: Catalog, ident: TableIdentifier, schema: Schema) {
  private var spec: PartitionSpec = PartitionSpec.unpartitioned
  private var sortOrder: SortOrder = SortOrder.unsorted
  private var location: Option[String] = None
  private var props: Map[String, String] = Map.empty

  def withPartitionSpec(s: PartitionSpec): TableBuilder = { spec = s; this }
  def withSortOrder(o: SortOrder): TableBuilder = { sortOrder = o; this }
  def withLocation(loc: String): TableBuilder = { location = Some(loc); this }
  def withProperties(ps: Map[String, String]): TableBuilder = { props ++= ps; this }
  def withProperty(k: String, v: String): TableBuilder = { props += (k -> v); this }

  /** Create and publish the table now. */
  def create(): TableRef =
    catalog.createTable(ident, schema, spec, sortOrder, props, location)

  /** Stage the creation: nothing is visible in the catalog until the
    * returned ref's first commit (use `IceTable.from(ref)` and a
    * Transaction to write data into the staged table). */
  def stageCreate(): TableRef =
    catalog.stageCreateTable(ident, schema, spec, sortOrder, props, location)
}

/** A loaded table handle: metadata + where it came from. */
final case class TableRef(ident: TableIdentifier, metadata: TableMetadata,
    version: Int, catalog: Catalog)

/** Directory-backed catalog (the working equivalent of the reference's
  * InMemoryCatalog, in_memory_catalog.cc:418-450, plus the Create/Update
  * paths it leaves NotImplemented — in_memory_catalog.cc:386-404).
  * Layout (HadoopCatalog-style):
  *   warehouse/ns1/ns2/table/metadata/v<N>.metadata.json
  *   warehouse/ns1/ns2/table/metadata/version-hint.text
  *   warehouse/ns1/ns2/table/data/...
  * Commit atomicity: write to a temp file, then publish via hard link
  * (create-new semantics) — the first committer of version N+1 wins,
  * losers get CommitFailedException and must refresh + retry
  * (commit.retry.* semantics, table_properties.h:80-93). */
class DirCatalog(val warehouse: String) extends Catalog {

  private def tableDir(ident: TableIdentifier): Path =
    Paths.get((warehouse +: ident.namespace :+ ident.name).mkString("/"))
  private def metadataDir(ident: TableIdentifier): Path =
    tableDir(ident).resolve("metadata")
  private def hintFile(ident: TableIdentifier): Path =
    metadataDir(ident).resolve("version-hint.text")

  /** write.metadata.path support (reference table_properties.h:222): the
    * DEFAULT metadata dir stays the catalog's pointer store (hint file +
    * this pointer), but version files may live under a custom folder.
    * The pointer names the dir holding the LATEST version file; version
    * discovery scans both dirs so a mid-life property change (old files
    * in one dir, new in the other) still resolves. */
  private def metadataPathPointer(ident: TableIdentifier): Path =
    metadataDir(ident).resolve("metadata-path.text")
  private def customMetadataDir(ident: TableIdentifier): Option[Path] = {
    val p = metadataPathPointer(ident)
    if (Files.exists(p)) Some(Paths.get(Files.readString(p).trim)) else None
  }
  private def versionDirs(ident: TableIdentifier): Seq[Path] =
    metadataDir(ident) +: customMetadataDir(ident).toSeq
  private def versionFile(ident: TableIdentifier, v: Int): Path = {
    val name = s"v$v.metadata.json"
    versionDirs(ident).map(_.resolve(name)).find(Files.exists(_))
      .getOrElse(versionDirs(ident).last.resolve(name))
  }
  /** Where the NEXT version file should land, honoring the metadata's
    * current write.metadata.path (empty = default layout). */
  private def targetVersionFile(ident: TableIdentifier, v: Int,
      meta: TableMetadata): Path = {
    val custom = TableProperties.get(meta.properties, TableProperties.MetadataPath)
    val dir = if (custom.isEmpty) metadataDir(ident)
      else Paths.get(graft.ice.manifest.ManifestAvro.stripFileScheme(custom))
    dir.resolve(s"v$v.metadata.json")
  }

  override def currentVersion(ident: TableIdentifier): Int = {
    val hint = hintFile(ident)
    // the hint is best-effort AND its write is not atomic: a reader racing
    // the writer can observe a missing, empty, or torn file — every such
    // shape falls back to scanning the metadata dirs (both the default
    // and any pointed-to custom metadata dir count)
    val hinted: Option[Int] =
      if (!Files.exists(hint)) None
      else (try Files.readString(hint).trim
        catch { case _: java.io.IOException => "" }).toIntOption
    hinted match {
      case None =>
        if (!Files.exists(metadataDir(ident))) return 0
        val versions = versionDirs(ident).filter(Files.isDirectory(_))
          .flatMap(d => Files.list(d).iterator.asScala
            .map(_.getFileName.toString)
            .collect { case s if s.startsWith("v") && s.endsWith(".metadata.json") =>
              s.stripPrefix("v").stripSuffix(".metadata.json").toIntOption
            }.flatten)
        versions.maxOption.getOrElse(0)
      case Some(h) =>
        // the hint may lag a concurrent commit; roll forward to the latest
        var v = h
        while (Files.exists(versionFile(ident, v + 1))) v += 1
        v
    }
  }

  override def tableExists(ident: TableIdentifier): Boolean =
    currentVersion(ident) > 0

  override def metadataLocation(ident: TableIdentifier): Option[String] = {
    val v = currentVersion(ident)
    if (v == 0) None else Some(versionFile(ident, v).toAbsolutePath.toString)
  }

  override def createTable(ident: TableIdentifier, schema: Schema,
      spec: PartitionSpec, sortOrder: SortOrder,
      properties: Map[String, String], location: Option[String]): TableRef = {
    if (tableExists(ident))
      throw new AlreadyExistsException(s"table $ident already exists")
    val loc = location.getOrElse(tableDir(ident).toAbsolutePath.toString)
    val meta = TableMetadata.newTable(loc, schema, spec, sortOrder, properties)
    Files.createDirectories(metadataDir(ident))
    writeVersion(ident, 1, meta)
    TableRef(ident, meta, 1, this)
  }

  override def loadTable(ident: TableIdentifier): TableRef = {
    val v = currentVersion(ident)
    if (v == 0) throw new NoSuchTableException(s"no such table: $ident")
    val meta = TableMetadataIO.read(versionFile(ident, v).toString)
    TableRef(ident, meta, v, this)
  }

  override def stageCreateTable(ident: TableIdentifier, schema: Schema,
      spec: PartitionSpec, sortOrder: SortOrder,
      properties: Map[String, String], location: Option[String]): TableRef = {
    if (tableExists(ident))
      throw new AlreadyExistsException(s"table $ident already exists")
    val loc = location.getOrElse(tableDir(ident).toAbsolutePath.toString)
    val meta = TableMetadata.newTable(loc, schema, spec, sortOrder, properties)
    // NO directory is created here: an abandoned staged create must leave
    // zero catalog footprint (listTables classifies on metadata/ presence);
    // commit() creates the directory when the table actually publishes
    TableRef(ident, meta, 0, this)
  }

  override def dropTable(ident: TableIdentifier, purge: Boolean): Boolean = {
    val dir = tableDir(ident)
    if (!Files.exists(dir)) return false
    if (purge) {
      // a custom write.metadata.path dir lives outside the table dir —
      // purge removes it too (its version files belong to this table)
      customMetadataDir(ident).filter(Files.exists(_))
        .filterNot(_.toAbsolutePath.startsWith(dir.toAbsolutePath))
        .foreach(md => Files.walk(md).sorted(java.util.Comparator.reverseOrder())
          .iterator.asScala.foreach(Files.delete))
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .iterator.asScala.foreach(Files.delete)
    } else {
      // drop from catalog only: remove the metadata pointer
      val md = metadataDir(ident)
      if (Files.exists(md))
        Files.walk(md).sorted(java.util.Comparator.reverseOrder())
          .iterator.asScala.foreach(Files.delete)
    }
    true
  }

  override def listTables(namespace: Seq[String]): Seq[TableIdentifier] = {
    val nsDir = Paths.get((warehouse +: namespace).mkString("/"))
    if (!Files.isDirectory(nsDir)) return Nil
    Files.list(nsDir).iterator.asScala
      .filter(p => Files.isDirectory(p.resolve("metadata")))
      .map(p => TableIdentifier(namespace, p.getFileName.toString))
      .toSeq.sortBy(_.name)
  }

  private def nsDir(namespace: Seq[String]): Path =
    Paths.get((warehouse +: namespace).mkString("/"))
  private def nsMarker(namespace: Seq[String]): Path =
    nsDir(namespace).resolve(".namespace.properties")
  private def isTableDir(p: Path): Boolean =
    Files.isDirectory(p.resolve("metadata"))

  override def listNamespaces(parent: Seq[String]): Seq[Seq[String]] = {
    val root = nsDir(parent)
    if (!Files.isDirectory(root)) return Nil
    Files.list(root).iterator.asScala
      .filter(Files.isDirectory(_))
      .filterNot(isTableDir) // table dirs aren't namespaces
      .map(p => parent :+ p.getFileName.toString)
      .toSeq.sortBy(_.mkString("."))
  }

  override def namespaceExists(namespace: Seq[String]): Boolean =
    namespace.nonEmpty && Files.isDirectory(nsDir(namespace)) &&
      !isTableDir(nsDir(namespace))

  override def createNamespace(namespace: Seq[String],
      properties: Map[String, String]): Unit = {
    require(namespace.nonEmpty, "namespace must have at least one level")
    if (namespaceExists(namespace))
      throw new AlreadyExistsException(s"namespace ${namespace.mkString(".")} already exists")
    Files.createDirectories(nsDir(namespace))
    writeNsProperties(namespace, properties)
  }

  override def dropNamespace(namespace: Seq[String]): Boolean = {
    if (!namespaceExists(namespace)) return false
    if (listTables(namespace).nonEmpty || listNamespaces(namespace).nonEmpty)
      throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} is not empty")
    Files.deleteIfExists(nsMarker(namespace))
    Files.deleteIfExists(nsDir(namespace))
    true
  }

  override def loadNamespaceProperties(namespace: Seq[String]): Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(s"no such namespace: ${namespace.mkString(".")}")
    val marker = nsMarker(namespace)
    if (!Files.exists(marker)) return Map.empty
    val props = new java.util.Properties()
    val in = Files.newInputStream(marker)
    try props.load(in) finally in.close()
    props.stringPropertyNames.asScala.map(k => k -> props.getProperty(k)).toMap
  }

  override def updateNamespaceProperties(namespace: Seq[String],
      updates: Map[String, String], removals: Set[String]): Unit = {
    val current = loadNamespaceProperties(namespace)
    writeNsProperties(namespace, current -- removals ++ updates)
  }

  private def writeNsProperties(namespace: Seq[String], props: Map[String, String]): Unit = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    val out = Files.newOutputStream(nsMarker(namespace))
    try p.store(out, null) finally out.close()
  }

  /** Register an existing metadata JSON as a table (the one InMemoryCatalog
    * operation that works, in_memory_catalog.cc:418). */
  override def registerTable(ident: TableIdentifier, metadataLocation: String): TableRef = {
    if (tableExists(ident))
      throw new AlreadyExistsException(s"table $ident already exists")
    val meta = TableMetadataIO.read(metadataLocation)
    Files.createDirectories(metadataDir(ident))
    writeVersion(ident, 1, meta)
    TableRef(ident, meta, 1, this)
  }

  override def commit(ident: TableIdentifier, baseVersion: Int,
      updated: TableMetadata): Int = {
    val next = baseVersion + 1
    // v1 of a staged create arrives before any directory exists
    if (baseVersion == 0) Files.createDirectories(metadataDir(ident))
    // honor the UPDATED metadata's write.metadata.path for the new file;
    // check the resolvable location too so two committers that disagree
    // on the property (one commit changes it) still collide on `next`
    val target = targetVersionFile(ident, next, updated)
    if (Files.exists(target) || Files.exists(versionFile(ident, next)))
      throw new CommitFailedException(
        s"$ident: version $next already committed by a concurrent writer")
    Files.createDirectories(target.getParent)
    // the whole commit race reduces to FileIO's first-committer-wins
    // primitive — an object-store catalog swaps in a conditional put here.
    // A clean false is a LOST RACE (retryable); an IOException mid-write
    // is an UNKNOWN outcome (the bytes may have landed) — surfaced as
    // such so the caller reconciles via commit.status-check instead of
    // blind-retrying into a double commit.
    val won =
      try graft.ice.io.LocalFileIO.writeIfAbsent(target.toString,
        TableMetadataIO.encode(updated))
      catch {
        case io: java.io.IOException =>
          throw new CommitStateUnknownException(
            s"$ident: outcome of commit v$next unknown: ${io.getMessage}",
            next, io)
      }
    if (!won)
      throw new CommitFailedException(s"$ident: lost race committing version $next")
    updatePointer(ident, target)
    // best-effort pointer, but written ATOMICALLY (temp+rename): a plain
    // write lets a concurrent reader observe an empty/torn hint
    graft.ice.io.LocalFileIO.writeAtomic(hintFile(ident).toString,
      next.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    next
  }

  /** Status-check probe: the attempt wrote (or failed to write) exactly
    * `encode(attempted)` at the deterministic version path — byte
    * equality of the landed file IS the answer. A missing file is a
    * definite no: writeIfAbsent performs no asynchronous work after its
    * call returns or throws. */
  override def commitLanded(ident: TableIdentifier, attemptedVersion: Int,
      attempted: TableMetadata, base: TableMetadata): Option[Boolean] = {
    val target = targetVersionFile(ident, attemptedVersion, attempted)
    if (!Files.exists(target)) Some(false)
    else Some(java.util.Arrays.equals(Files.readAllBytes(target),
      TableMetadataIO.encode(attempted)))
  }

  /** Keep metadata-path.text naming the dir of the latest version file
    * (best-effort, like the hint): present iff that dir is custom. */
  private def updatePointer(ident: TableIdentifier, written: Path): Unit = {
    val dir = written.getParent.toAbsolutePath
    if (dir == metadataDir(ident).toAbsolutePath)
      Files.deleteIfExists(metadataPathPointer(ident))
    else Files.writeString(metadataPathPointer(ident), dir.toString)
  }

  private def writeVersion(ident: TableIdentifier, v: Int, meta: TableMetadata): Unit = {
    val target = targetVersionFile(ident, v, meta)
    Files.createDirectories(target.getParent)
    graft.ice.io.LocalFileIO.writeAtomic(target.toString,
      TableMetadataIO.encode(meta))
    updatePointer(ident, target)
    graft.ice.io.LocalFileIO.writeAtomic(hintFile(ident).toString,
      v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
