package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, In, IsNotNull, StringStartsWith}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the reference engine's OUTPUT FORMAT:
  * `mr-out-*` text files with one `"<key> <value>"` line per record
  * (reference: mr/worker.go:175, format rule README.md:195) — so
  * artifacts produced by the original Go system (or by
  * [[graft.mr.MapReduceJob.saveText]]) are first-class Spark tables in
  * BOTH directions:
  *
  * {{{
  *   spark.read.format("mrout").load(dir)            // → (key, value)
  *   df.write.format("mrout").mode("overwrite").save(dir)
  *       // → dir/mr-out-0, dir/mr-out-1, ... (reference naming)
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
  *   - readers stream line-by-line — O(1) memory per task;
  *   - all file access goes through the Hadoop FileSystem API, so any
  *     Hadoop-compatible store (HDFS, S3A, local file://) works, and
  *     listing happens once on the driver;
  *   - the write path mirrors the reference's commit protocol
  *     (mr/worker.go:108-121): each task writes a hidden temp file and
  *     the DRIVER renames all temps to their final `mr-out-<N>` names
  *     only after every task has committed — output is never partially
  *     visible, and a speculative/retried attempt's orphan temp is
  *     swept, never renamed.
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

  private[sources] def hadoopConf(): Configuration =
    SparkSession.active.sessionState.newHadoopConf()

  private[sources] def fs(path: String, conf: Configuration): FileSystem =
    new Path(path).getFileSystem(conf)

  /** Default split size for large files: Spark's own
    * `files.maxPartitionBytes` default. Files at or below this stay one
    * partition (the reference's `mr-out-<N>` unit of parallelism);
    * anything bigger — e.g. a single multi-GB mr-out from an external
    * producer — is range-split so it doesn't become one task.
    */
  val DefaultMaxSplitBytes: Long = 128L * 1024 * 1024

  /** All data files under `path` (non-recursive) with their sizes,
    * deterministic order — driver-side, via the Hadoop FileSystem API
    * (object-store safe).
    */
  private[sources] def listFiles(path: String): Array[(String, Long)] = {
    val p = new Path(path)
    val filesystem = fs(path, hadoopConf())
    val st = filesystem.getFileStatus(p)
    val files =
      if (st.isFile) Array(st)
      else filesystem.listStatus(p).filter { c =>
        val n = c.getPath.getName
        c.isFile && !n.startsWith(".") && !n.startsWith("_")
      }
    files.map(s => (s.getPath.toString, s.getLen)).sortBy(_._1)
  }

  /** Delete uncommitted task temps (speculative/failed/aborted
    * attempts) — shared by the batch and streaming commit paths.
    */
  private[sources] def sweepTemps(filesystem: FileSystem, dir: Path): Unit =
    filesystem.listStatus(dir)
      .filter(_.getPath.getName.startsWith(".mr-tmp-"))
      .foreach(s => filesystem.delete(s.getPath, false))
}

/** Hadoop `Configuration` is `Writable`, not `Serializable`; this small
  * envelope ships it to executor-side readers/writers (the standard
  * connector pattern, e.g. Spark's own `SerializableConfiguration`).
  */
private[sources] class SerializableConf(@transient var conf: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit =
    conf.write(out)
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    conf = new Configuration(false)
    conf.readFields(in)
  }
}

private class MrOutTable(props: Map[String, String])
    extends Table with SupportsRead with SupportsWrite {
  private val path = props.getOrElse("path",
    throw new IllegalArgumentException("mrout: 'path' option is required"))

  override def name(): String = s"mrout($path)"
  override def schema(): StructType = MrOutSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MrOutScanBuilder(path,
      Option(options.get("maxSplitBytes")).map { v =>
        val n = try v.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"mrout: maxSplitBytes must be a positive long, got '$v'")
        }
        require(n > 0, s"mrout: maxSplitBytes must be > 0, got $n")
        n
      }.getOrElse(MrOutSource.DefaultMaxSplitBytes))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val in = info.schema()
    require(in.length == 2 && in.forall(_.dataType == StringType),
      s"mrout sink expects exactly (key STRING, value STRING), got $in")
    // the key column is POSITIONAL (first of the two) — sort/cluster
    // requirements must name whatever the caller called it, not assume
    // a literal "key"
    new MrOutWriteBuilder(path, in.fields(0).name,
      Option(info.options.get("nReduce")).map(_.toInt).getOrElse(0))
  }
}

private class MrOutScanBuilder(path: String, maxSplitBytes: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = MrOutSource.Schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Push the filter shapes a line reader can apply before building a
    * row: equality / IN / prefix on either string column. The reader
    * evaluates them on `UTF8String` — the SAME representation and
    * semantics Spark's residual filter uses above the scan — so the
    * pushed pre-filter is exactly the residual predicate, never a
    * narrower one (Java `String` UTF-16 comparisons can diverge on
    * unpaired surrogates, and a pre-filter that drops a row the
    * residual would keep is unrecoverable). Ordering comparisons are
    * NOT pushed — UTF-16 vs UTF-8 binary order diverges beyond the
    * BMP. Everything stays residual too (Spark re-checks above the
    * scan); the win is skipping row materialization for non-matching
    * lines — e.g. a single-key lookup over a TB of mr-out files
    * allocates no rows for the other keys.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def supported(f: Filter): Boolean = f match {
      case EqualTo(_, v)           => v.isInstanceOf[String]
      case In(_, vs)               => vs.forall(_.isInstanceOf[String])
      case StringStartsWith(_, _)  => true
      case IsNotNull(_)            => true // never null: trivially true
      case _                       => false
    }
    pushed = filters.filter(supported)
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new MrOutScan(path, required, maxSplitBytes, pushed)
}

private class MrOutScan(path: String, required: StructType,
                        maxSplitBytes: Long, pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"mrout $path, PushedFilters: ${pushed.mkString("[", ", ", "]")}"

  /** One partition per file up to `maxSplitBytes`; bigger files get
    * byte-range splits with line-boundary handoff in the reader (the
    * Hadoop text-split rule: a range starting past 0 skips its leading
    * partial line; the range owning a line's start reads it to the end,
    * possibly past its own boundary — every line read exactly once).
    */
  override def planInputPartitions(): Array[InputPartition] =
    MrOutSource.listFiles(path).flatMap { case (file, len) =>
      if (len <= maxSplitBytes) Array(MrOutFilePartition(file, 0L, len))
      else {
        val n = (len + maxSplitBytes - 1) / maxSplitBytes // Long: no overflow
        require(n <= Int.MaxValue,
          s"mrout: $file ($len bytes / $maxSplitBytes-byte splits) would " +
            s"need $n partitions; raise maxSplitBytes")
        Array.tabulate(n.toInt) { i =>
          val start = i.toLong * maxSplitBytes
          MrOutFilePartition(file, start, math.min(maxSplitBytes, len - start))
        }
      }
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new MrOutReaderFactory(required.fieldNames, pushed,
      new SerializableConf(MrOutSource.hadoopConf()))
}

private case class MrOutFilePartition(file: String, start: Long, length: Long)
    extends InputPartition

private class MrOutReaderFactory(fields: Array[String],
                                 pushed: Array[Filter],
                                 conf: SerializableConf)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new MrOutReader(p.asInstanceOf[MrOutFilePartition], fields, pushed,
      conf.conf)
}

/** Streams one byte range of an `mr-out` file; splits each line at the
  * FIRST space (keys never contain spaces in the reference format;
  * values may). Range semantics follow Hadoop's `LineRecordReader`:
  * a range with `start > 0` discards its leading (possibly partial)
  * line — the previous range reads it — and a line that starts at or
  * before `start + length` is read to its end even if that runs past
  * the range, so concatenating all ranges yields each line exactly once.
  * Byte positions come from Hadoop's `LineReader` (which reports bytes
  * consumed, unlike `BufferedReader`), with UTF-8 decode per line.
  */
private class MrOutReader(part: MrOutFilePartition, fields: Array[String],
                          pushed: Array[Filter], conf: Configuration)
    extends PartitionReader[InternalRow] {
  // pushed filters compiled once to (key, value) => Boolean over
  // UTF8String — byte-identical to the residual filter's semantics (a
  // Java-String prefix test can disagree on unpaired surrogates, and a
  // pushed pre-filter must never be narrower than the residual). A
  // column is only converted when a filter or the projection needs it,
  // so a filtered-out line still skips row construction.
  private val keep: Array[(UTF8String, UTF8String) => Boolean] = pushed.map {
    case EqualTo(a, v: String) =>
      val u = UTF8String.fromString(v)
      if (a == "key") (k: UTF8String, _: UTF8String) => k.equals(u)
      else (_: UTF8String, v2: UTF8String) => v2.equals(u)
    case In(a, vs) =>
      val set = vs.collect { case s: String => UTF8String.fromString(s) }.toSet
      if (a == "key") (k: UTF8String, _: UTF8String) => set.contains(k)
      else (_: UTF8String, v2: UTF8String) => set.contains(v2)
    case StringStartsWith(a, p) =>
      val u = UTF8String.fromString(p)
      if (a == "key") (k: UTF8String, _: UTF8String) => k.startsWith(u)
      else (_: UTF8String, v2: UTF8String) => v2.startsWith(u)
    case _ =>
      (_: UTF8String, _: UTF8String) => true // IsNotNull: never null
  }
  private val needKey =
    pushed.exists(_.references.contains("key"))
  private val needValue =
    pushed.exists(_.references.contains("value"))
  private val stream = MrOutSource.fs(part.file, conf).open(new Path(part.file))
  private val end = part.start + part.length
  private var pos = part.start
  private val in = {
    stream.seek(part.start)
    val r = new org.apache.hadoop.util.LineReader(stream, conf)
    if (part.start > 0) pos += r.readLine(new org.apache.hadoop.io.Text())
    r
  }
  private val text = new org.apache.hadoop.io.Text()
  // field slots resolved once; one row object reused across lines (the
  // row is copied by the scan exec's unsafe projection)
  private val row = new GenericInternalRow(fields.length)
  private val keySlot = fields.indexOf("key")
  private val valueSlot = fields.indexOf("value")
  // count(*)-style scans with no filters never need the line decoded
  private val rawCount = keep.isEmpty && keySlot < 0 && valueSlot < 0

  override def next(): Boolean = {
    while (pos <= end) {
      val n = in.readLine(text)
      if (n == 0) return false
      pos += n
      if (rawCount) return true
      val line = text.toString
      val sp = line.indexOf(' ')
      val k = if (sp < 0) line else line.substring(0, sp)
      val v = if (sp < 0) "" else line.substring(sp + 1)
      // convert only the columns some filter or the projection touches —
      // a key-only lookup never materializes value bytes
      val uk = if (keySlot >= 0 || needKey) UTF8String.fromString(k) else null
      val uv = if (valueSlot >= 0 || needValue) UTF8String.fromString(v)
               else null
      var ok = true
      var i = 0
      while (ok && i < keep.length) { ok = keep(i)(uk, uv); i += 1 }
      if (ok) {
        // empty projections (count(*) pushes no columns) still count lines
        if (keySlot >= 0) row.update(keySlot, uk)
        if (valueSlot >= 0) row.update(valueSlot, uv)
        return true
      }
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}

// ---------------------------------------------------------------- write

/** `nReduce > 0` reproduces the reference's reduce-side layout
  * declaratively (main/mrcoordinator.go:23 hardcodes nReduce=10;
  * mr/worker.go's FNV hash routes each key to one mr-out file):
  * [[RequiresDistributionAndOrdering]] asks Spark for a key-clustered
  * exchange into exactly nReduce partitions — the engine inserts the
  * shuffle, AQE keeps the partition count — so every key lands wholly
  * in one `mr-out-<N>` file. Files are key-sorted in either mode, like
  * the reference's reducer output (mr/worker.go:164-175).
  */
private class MrOutWriteBuilder(path: String, keyCol: String, nReduce: Int)
    extends WriteBuilder with SupportsTruncate {
  private var overwrite = false

  override def truncate(): WriteBuilder = { overwrite = true; this }

  override def build(): Write = new Write
      with RequiresDistributionAndOrdering {
    override def requiredDistribution(): Distribution =
      if (nReduce > 0)
        Distributions.clustered(Array(Expressions.identity(keyCol)))
      else Distributions.unspecified()
    override def requiredNumPartitions(): Int = nReduce // 0 = caller's
    override def requiredOrdering(): Array[SortOrder] = Array(
      Expressions.sort(Expressions.column(keyCol),
        SortDirection.ASCENDING))
    override def toBatch: BatchWrite =
      new MrOutBatchWrite(path, overwrite,
        new SerializableConf(MrOutSource.hadoopConf()))
    override def toStreaming: StreamingWrite =
      new MrOutStreamingWrite(path,
        new SerializableConf(MrOutSource.hadoopConf()))
  }
}

private case class MrOutCommit(partitionId: Int, tempFile: String)
    extends WriterCommitMessage

/** Job-level atomic commit, same protocol as the reference
  * (mr/worker.go:108-121 writes `mr-tmp-*` then `os.Rename`s): tasks
  * write `.mr-tmp-<partition>-<taskId>`; only the driver's `commit`
  * renames the one committed temp per partition to `mr-out-<partition>`.
  */
private class MrOutBatchWrite(path: String, overwrite: Boolean,
                              conf: SerializableConf) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = new MrOutWriterFactory(path, conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val filesystem = MrOutSource.fs(path, conf.conf)
    val dir = new Path(path)
    filesystem.mkdirs(dir)
    // Truncate = empty the table: every visible data file goes (the
    // table is the directory — stale part-* files from other writers
    // would otherwise still be listed by the scan).
    if (overwrite)
      filesystem.listStatus(dir)
        .filter { s =>
          val n = s.getPath.getName
          s.isFile && !n.startsWith(".") && !n.startsWith("_")
        }
        .foreach(s => filesystem.delete(s.getPath, false))
    messages.foreach { case MrOutCommit(pid, temp) =>
      val dst = new Path(dir, s"mr-out-$pid")
      // Hadoop rename reports failure as `false`, not an exception — a
      // silently missing output file must fail the JOB, not the reader
      require(filesystem.rename(new Path(temp), dst),
        s"mrout commit: rename $temp -> $dst failed")
    }
    MrOutSource.sweepTemps(filesystem, dir) // orphaned failed attempts
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val filesystem = MrOutSource.fs(path, conf.conf)
    val dir = new Path(path)
    if (filesystem.exists(dir)) MrOutSource.sweepTemps(filesystem, dir)
  }
}

private class MrOutWriterFactory(path: String, conf: SerializableConf)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new MrOutWriter(path, partitionId, s".mr-tmp-$partitionId-$taskId",
      conf.conf)
}

/** Streaming flavor of the same commit protocol, per EPOCH: each
  * micro-batch's tasks write hidden temps, and `commit(epochId, …)`
  * renames them to `mr-out-<epochId>-<partitionId>` — the reference's
  * per-reducer naming extended with the epoch, so a bounded stream
  * drains to files the `mrout` scan reads like any other output dir.
  * Exactly-once visibility per epoch: a replayed epoch re-renames over
  * its own files (delete-then-rename is idempotent), and an aborted
  * epoch's temps are swept, never renamed.
  */
private class MrOutStreamingWrite(path: String, conf: SerializableConf)
    extends StreamingWrite {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory = new MrOutStreamingWriterFactory(path, conf)

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val filesystem = MrOutSource.fs(path, conf.conf)
    val dir = new Path(path)
    filesystem.mkdirs(dir)
    // Epoch-scoped sweep BEFORE renaming: a prior attempt of this epoch
    // may have crashed after renaming some partitions but before Spark's
    // commit-log write; if the replay produces FEWER writer partitions,
    // the earlier attempt's extra mr-out-<epoch>-<pid> files would
    // survive the per-name delete-then-rename below and double-count on
    // read-back. Deleting every file of this epoch not named by the
    // current message set makes replay idempotent regardless of
    // partition-count drift.
    val current = messages.map { case MrOutCommit(pid, _) =>
      s"mr-out-$epochId-$pid" }.toSet
    filesystem.listStatus(dir)
      .filter { s =>
        val n = s.getPath.getName
        s.isFile && n.startsWith(s"mr-out-$epochId-") && !current.contains(n)
      }
      .foreach(s => filesystem.delete(s.getPath, false))
    messages.foreach { case MrOutCommit(pid, temp) =>
      val dst = new Path(dir, s"mr-out-$epochId-$pid")
      filesystem.delete(dst, false) // epoch replay: idempotent overwrite
      require(filesystem.rename(new Path(temp), dst),
        s"mrout epoch commit: rename $temp -> $dst failed")
    }
    MrOutSource.sweepTemps(filesystem, dir)
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit = {
    val filesystem = MrOutSource.fs(path, conf.conf)
    val dir = new Path(path)
    if (filesystem.exists(dir)) MrOutSource.sweepTemps(filesystem, dir)
  }
}

private class MrOutStreamingWriterFactory(path: String,
                                          conf: SerializableConf)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] =
    new MrOutWriter(path, partitionId,
      s".mr-tmp-$epochId-$partitionId-$taskId", conf.conf)
}

private class MrOutWriter(path: String, partitionId: Int, tempName: String,
                          conf: Configuration)
    extends DataWriter[InternalRow] {
  private val temp = new Path(path, tempName)
  private val filesystem = MrOutSource.fs(path, conf)
  // Local ChecksumFileSystem would otherwise drop .crc sidecars next to
  // every mr-out file — the reference dir contains data files only.
  filesystem.setWriteChecksum(false)
  private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    filesystem.create(temp, true),
    java.nio.charset.StandardCharsets.UTF_8))

  override def write(record: InternalRow): Unit = {
    out.write(record.getUTF8String(0).toString)
    out.write(' ')
    out.write(record.getUTF8String(1).toString)
    out.write('\n')
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    MrOutCommit(partitionId, temp.toString)
  }

  override def abort(): Unit = {
    out.close()
    filesystem.delete(temp, false)
  }

  override def close(): Unit = ()
}
