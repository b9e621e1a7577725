package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the reference engine's OUTPUT FORMAT:
  * `mr-out-*` text files with one `"<key> <value>"` line per record
  * (reference: mr/worker.go:175, format rule README.md:195) — so
  * artifacts produced by the original Go system (or by
  * [[graft.mr.MapReduceJob.saveText]]) are first-class Spark tables:
  *
  * {{{
  *   spark.read.format("mrout").load(dir)   // → (key STRING, value STRING)
  * }}}
  *
  * Connector shape (the part that matters at scale):
  *   - one InputPartition per file — the reference's unit of output
  *     parallelism (`mr-out-<reducePartition>`) maps 1:1 onto Spark scan
  *     tasks;
  *   - column pruning is pushed into the reader
  *     ([[SupportsPushDownRequiredColumns]]): a key-only projection
  *     never materializes value strings (visible as `ReadSchema` in
  *     `.explain("formatted")`);
  *   - readers stream line-by-line — O(1) memory per task.
  *
  * Local-filesystem listing keeps the harness dependency-free; a
  * production build would list via the Hadoop FileSystem API instead
  * (same partition structure).
  */
class MrOutSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "mrout"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MrOutSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new MrOutTable(properties.asScala.toMap)
}

object MrOutSource {
  val Schema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", StringType, nullable = false)))

  /** All data files under `path` (non-recursive), deterministic order. */
  private[sources] def listFiles(path: String): Array[String] = {
    val f = new java.io.File(path)
    val files =
      if (f.isFile) Array(f)
      else f.listFiles().filter(c => c.isFile && !c.getName.startsWith(".")
        && !c.getName.startsWith("_"))
    files.map(_.getAbsolutePath).sorted
  }
}

private class MrOutTable(props: Map[String, String])
    extends Table with SupportsRead {
  private val path = props.getOrElse("path",
    throw new IllegalArgumentException("mrout: 'path' option is required"))

  override def name(): String = s"mrout($path)"
  override def schema(): StructType = MrOutSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MrOutScanBuilder(path)
}

private class MrOutScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = MrOutSource.Schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new MrOutScan(path, required)
}

private class MrOutScan(path: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    MrOutSource.listFiles(path).map(MrOutFilePartition(_))

  override def createReaderFactory(): PartitionReaderFactory =
    new MrOutReaderFactory(required.fieldNames)
}

private case class MrOutFilePartition(file: String) extends InputPartition

private class MrOutReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new MrOutReader(p.asInstanceOf[MrOutFilePartition].file, fields)
}

/** Streams one `mr-out` file; splits each line at the FIRST space (keys
  * never contain spaces in the reference format; values may).
  */
private class MrOutReader(file: String, fields: Array[String])
    extends PartitionReader[InternalRow] {
  private val in = new java.io.BufferedReader(new java.io.InputStreamReader(
    new java.io.FileInputStream(file), java.nio.charset.StandardCharsets.UTF_8))
  private val wantKey = fields.contains("key")
  private val wantValue = fields.contains("value")
  private var row: InternalRow = _

  override def next(): Boolean = {
    val line = in.readLine()
    if (line == null) { row = null; false }
    else {
      val sp = line.indexOf(' ')
      val (k, v) = if (sp < 0) (line, "") else
        (line.substring(0, sp), line.substring(sp + 1))
      val vals = fields.map {
        case "key"   => UTF8String.fromString(k)
        case "value" => UTF8String.fromString(v)
      }
      row = new GenericInternalRow(vals.asInstanceOf[Array[Any]])
      // readers must tolerate empty projections (count(*) pushes none)
      if (!wantKey && !wantValue) row = new GenericInternalRow(Array.empty[Any])
      true
    }
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
