package graft.sources

import java.nio.file.{Files => JFiles, Path => JPath, Paths => JPaths}
import java.util

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.execution.datasources.{FileStatusCache, NoopCache, PartitioningAwareFileIndex, PartitionPath, PartitionSpec}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.FileTable
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The snapshot store's SQL door: a DataSource-V2 `TableCatalog` that
  * resolves snapshot stores as catalog tables WITH TIME TRAVEL —
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.snap",
  *     "graft.sources.GraftSnapshotCatalog")
  *   spark.conf.set("spark.sql.catalog.snap.warehouse", "/stores")
  *   spark.sql("SELECT * FROM snap.orders VERSION AS OF 2")
  * }}}
  *
  * `VERSION AS OF n` lands in `loadTable(ident, version)`; a bare
  * reference resolves the head. Each table is served by
  * [[SnapshotV2Table]], whose file listing comes from the SAME
  * manifest plane as the DataFrame door (the `v<N>.files` sidecar when
  * present — zero `listStatus` planning), and whose scans are ordinary
  * DSv2 parquet scans (pushdown, pruning, AQE all apply). The catalog
  * is READ-ONLY by design: commits go through the `graft-snapshot`
  * format's write door, which owns the CAS publish protocol — exposing
  * DDL here would bypass it.
  *
  * A table named `t` is the store rooted at `<warehouse>/t`. The store
  * must carry a `table.meta` sidecar (every store bootstrapped through
  * the current write paths does); pre-sidecar stores use the DataFrame
  * door, which still supports schema inference.
  */
final class GraftSnapshotCatalog extends TableCatalog {
  private var catName: String = _
  private var warehouse: JPath = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catName = name
    warehouse = JPaths.get(Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs spark.sql.catalog.$name.warehouse")))
  }

  override def name(): String = catName

  private def rootOf(ident: Identifier): JPath = {
    val root = ident.namespace().foldLeft(warehouse)(_.resolve(_))
      .resolve(ident.name())
    if (!JFiles.isDirectory(root.resolve("manifests")))
      throw new NoSuchTableException(ident)
    root
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val base = namespace.foldLeft(warehouse)(_.resolve(_))
    Option(base.toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory &&
        new java.io.File(f, "manifests").isDirectory)
      .map(f => Identifier.of(namespace, f.getName))
  }

  override def loadTable(ident: Identifier): Table =
    load(ident, None)

  /** `VERSION AS OF n` — the time-travel door. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(version.toInt))

  /** `TIMESTAMP AS OF t` — resolved to the LAST version whose manifest
    * was published at or before `t` (the Delta-Lake semantics, which
    * also derives commit times from the commit files' modification
    * times: the manifest link is the atomic publish instant). Spark
    * hands the timestamp in MICROSECONDS since the epoch.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val root = rootOf(ident)
    val mdir = root.resolve("manifests")
    val versions = Option(mdir.toFile.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("v\\d+\\.manifest"))
      .map(f => (f.getName.stripPrefix("v").stripSuffix(".manifest").toInt,
        f.lastModified()))
    val cutoffMs = timestamp / 1000L
    val v = versions.filter(_._2 <= cutoffMs).map(_._1)
      .reduceOption(math.max).getOrElse(
        throw new NoSuchTableException(ident))
    load(ident, Some(v))
  }

  private def load(ident: Identifier, v: Option[Int]): Table = {
    val root = rootOf(ident)
    val version = v.getOrElse(SnapshotManifest.head(root))
    val meta = SnapshotMeta.read(root).getOrElse(
      throw new NoSuchTableException(ident))
    // same latest-schema overlay as the DataFrame door: a widening
    // commit's `#schema` manifest record supersedes the bootstrap meta
    val effective = SnapshotManifest.evolvedDataSchema(root)
      .map(ds => meta.copy(dataSchema = ds)).getOrElse(meta)
    new SnapshotV2Table(s"$catName.${ident.name()}@v$version",
      SparkSession.active, root, version, effective)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "read-only catalog: bootstrap stores through " +
        "df.write.format(\"graft-snapshot\")")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("read-only catalog")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("read-only catalog")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("read-only catalog")
}

/** One snapshot version as a DSv2 table: `FileTable` over a
  * manifest-served [[SnapshotPartitioningIndex]], scans built by the
  * stock `ParquetScanBuilder` — so SQL gets the identical read path
  * (partition pruning against manifest values, sidecar-served file
  * listing, parquet pushdown) that the DataFrame door's
  * [[SnapshotFileIndex]] provides, without re-implementing a reader.
  */
final class SnapshotV2Table(
    tableName: String,
    spark: SparkSession,
    root: JPath,
    version: Int,
    meta: SnapshotMeta.Meta)
  extends FileTable(spark, CaseInsensitiveStringMap.empty(), Nil,
    Some(meta.dataSchema)) {

  override def name(): String = tableName

  override lazy val fileIndex: PartitioningAwareFileIndex =
    new SnapshotPartitioningIndex(spark, root, version,
      meta.partitionSchema, meta.dataSchema)

  override def inferSchema(files: Seq[FileStatus]): Option[StructType] =
    Some(meta.dataSchema)

  override def formatName: String = "graft-snapshot"

  override def fallbackFileFormat
      : Class[_ <: org.apache.spark.sql.execution.datasources.FileFormat] =
    classOf[ParquetFileFormat]

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ParquetScanBuilder =
    ParquetScanBuilder(spark, fileIndex, schema, dataSchema,
      mergedOptions(options))

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    throw new UnsupportedOperationException(
      "snapshot versions are immutable: commit through " +
        "df.write.format(\"graft-snapshot\")")
}

/** The manifest plane as a `PartitioningAwareFileIndex` — the index
  * shape the DSv2 file-source machinery plans against. Partition
  * pruning runs in the PARENT's `listFiles` over the typed manifest
  * values ([[SnapshotPartitionValues]]); the per-dir file lists come
  * from the `v<N>.files` sidecar when present (zero `listStatus`
  * calls) and from one listing per dir otherwise.
  */
final class SnapshotPartitioningIndex(
    spark: SparkSession,
    root: JPath,
    version: Int,
    partSchema: StructType,
    dataSchema: StructType,
    cache: FileStatusCache = NoopCache)
  extends PartitioningAwareFileIndex(spark, Map.empty, Some(dataSchema),
    cache) {

  private val manifest: Map[String, String] =
    SnapshotManifest.read(root, version)
  private val sidecar = SnapshotFiles.read(root, version)

  /** `listStatus` calls made — spec hook (0 with a sidecar). */
  @volatile var fsListCalls: Int = 0

  private lazy val filesByDir: Map[Path, Array[FileStatus]] =
    manifest.toSeq.sortBy(_._1).map { case (pv, dir) =>
      val listed: Array[FileStatus] = sidecar match {
        case Some(fm) =>
          fm.getOrElse(pv, Nil).map(SnapshotFiles.status).toArray
        case None =>
          fsListCalls += 1
          SnapshotFiles.listDataFiles(
            spark.sparkContext.hadoopConfiguration, dir)
      }
      new Path(dir) -> listed
    }.toMap

  override def partitionSpec(): PartitionSpec =
    PartitionSpec(partSchema, manifest.keys.toSeq.sorted.map(pv =>
      PartitionPath(SnapshotPartitionValues.row(pv, partSchema),
        new Path(manifest(pv)))))

  override def leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    filesByDir

  override def leafFiles: mutable.LinkedHashMap[Path, FileStatus] = {
    val m = mutable.LinkedHashMap.empty[Path, FileStatus]
    filesByDir.toSeq.sortBy(_._1.toString).foreach { case (_, sts) =>
      sts.foreach(st => m.put(st.getPath, st))
    }
    m
  }

  override def rootPaths: Seq[Path] =
    manifest.values.toSeq.sorted.map(new Path(_))

  override def refresh(): Unit = () // snapshot versions are immutable
}
