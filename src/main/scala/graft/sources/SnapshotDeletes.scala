package graft.sources

import java.nio.file.{Path => JPath}

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, UnsafeProjection}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** MERGE-ON-READ deletes — the read half. A merge-on-read DELETE
  * (`SnapshotMeta.deleteMode = "merge-on-read"`) publishes the doomed
  * KEYS as per-partition parquet sidecars referenced by `#delete`
  * manifest records ([[graft.operators.SourceQueries
  * .snapshotMorDelete]]); nothing under the data dirs moves. Every
  * reader then applies the records as an anti-filter on the store's
  * upsert key:
  *
  *  - the DataFrame door anti-joins ([[applyTo]] — the delete side is
  *    delta-sized, so it broadcasts; the fact side never shuffles);
  *  - the SQL catalog's scans filter per TASK
  *    ([[SnapshotDeleteBatch]]): each executor loads the doomed-key
  *    set once (sorted-array binary search, no per-row boxing) and
  *    drops matching rows as they stream out of the stock parquet
  *    reader — O(delta) memory, zero extra shuffle, composing
  *    unchanged with partition pruning, DPP, and SPJ (deleting rows
  *    never moves a key across partitions).
  *
  * This is the Iceberg equality-delete shape keyed on the ONE column
  * the store already declares unique (the upsert key), so a delete
  * file needs no per-file scoping to be exact: a key is doomed
  * table-wide, and partition-scoped records exist purely so pruning
  * and compaction stay O(touched). At 100 TB the trade is the point —
  * a takedown DELETE spanning 50 partitions commits kilobytes instead
  * of rewriting 50 partitions, and `CALL snap.compact` materializes
  * the filter back into clean files when read-amplification warrants.
  */
object SnapshotDeletes {

  /** The doomed-key set of one record's delete dirs: probed per row on
    * the scan hot path, so it is a sorted primitive/UTF8 array with
    * binary-search membership (no per-row boxing, delta-sized).
    */
  sealed trait Doomed {
    def contains(row: InternalRow, i: Int): Boolean
    def size: Int
  }

  private final class DoomedLongs(sorted: Array[Long], asInt: Boolean)
    extends Doomed {
    override def contains(row: InternalRow, i: Int): Boolean =
      !row.isNullAt(i) && java.util.Arrays.binarySearch(sorted,
        if (asInt) row.getInt(i).toLong else row.getLong(i)) >= 0
    override def size: Int = sorted.length
  }

  private final class DoomedStrings(sorted: Array[UTF8String])
    extends Doomed {
    override def contains(row: InternalRow, i: Int): Boolean =
      !row.isNullAt(i) && java.util.Arrays.binarySearch(
        sorted.asInstanceOf[Array[AnyRef]], row.getUTF8String(i)) >= 0
    override def size: Int = sorted.length
  }

  /** Key types the merge-on-read door admits (checked at DELETE time,
    * so readers can bind the probe unconditionally).
    */
  def supportedKeyType(dt: DataType): Boolean =
    dt == LongType || dt == IntegerType || dt == StringType

  /** Per-executor cache of loaded doomed sets: delete files are
    * immutable once published (write-once like every store file), so
    * the dir list IS the identity. Wholesale reset bounds it (the JVM
    * may touch many short-lived test stores).
    */
  private val cache = TrieMap.empty[String, Doomed]

  /** Load (or serve cached) the doomed keys of `dirs` — executor-side,
    * plain parquet-hadoop readers over the delete files (delta-sized
    * by construction; no SparkSession exists in a task).
    */
  def doomedKeys(dirs: Seq[String], keyType: DataType): Doomed = {
    val key = dirs.sorted.mkString("\n") + "#" + keyType.typeName
    cache.get(key) match {
      case Some(d) => d
      case None =>
        if (cache.size >= 64) cache.clear()
        val d = readKeys(dirs, keyType)
        cache.put(key, d)
        d
    }
  }

  private def readKeys(dirs: Seq[String], keyType: DataType): Doomed = {
    val files = dirs.flatMap(d =>
      Option(new java.io.File(d).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath)).sorted
    val longs = scala.collection.mutable.ArrayBuffer.empty[Long]
    val strings = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    files.foreach { f =>
      val reader = org.apache.parquet.hadoop.ParquetReader
        .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
          new org.apache.hadoop.fs.Path(f))
        .withConf(new org.apache.hadoop.conf.Configuration())
        .build()
      try {
        var g = reader.read()
        while (g != null) {
          if (g.getType.getFieldCount > 0 &&
              g.getFieldRepetitionCount(0) > 0) keyType match {
            case LongType => longs += g.getLong(0, 0)
            case IntegerType => longs += g.getInteger(0, 0).toLong
            case StringType =>
              strings += UTF8String.fromBytes(g.getBinary(0, 0).getBytes)
            case other => throw new IllegalStateException(
              s"unsupported merge-on-read key type $other")
          }
          g = reader.read()
        }
      } finally reader.close()
    }
    keyType match {
      case StringType =>
        val arr = strings.distinct.toArray
        java.util.Arrays.sort(arr.asInstanceOf[Array[AnyRef]])
        new DoomedStrings(arr)
      case dt =>
        val arr = longs.distinct.toArray
        java.util.Arrays.sort(arr)
        new DoomedLongs(arr, asInt = dt == IntegerType)
    }
  }

  /** DataFrame-door anti-filter: broadcast anti-join on the upsert key
    * when the version carries live `#delete` records, identity
    * otherwise. The delete side is read POSITIONALLY (delete files
    * hold exactly one column) and aliased to the CURRENT key name, so
    * records published before a key rename keep applying.
    */
  def applyTo(s: SparkSession, df: DataFrame, root: JPath,
              version: Int): DataFrame = {
    val recs = SnapshotManifest.deleteRecords(root, version)
    if (recs.isEmpty) df
    else {
      val keyCol = SnapshotMeta.read(root).flatMap(_.keyCol).getOrElse(
        throw new IllegalStateException(
          s"$root carries #delete records but table.meta declares no " +
            "key_column — the records are keyed on the upsert key"))
      val dirs = recs.valuesIterator.flatten.toSeq.distinct.sorted
      val doomed = s.read.parquet(dirs: _*).toDF(keyCol).distinct()
      df.join(org.apache.spark.sql.functions.broadcast(doomed),
        Seq(keyCol), "left_anti")
    }
  }

  /** Read-plane state for the SQL catalog's scans: present exactly
    * when the served version has live records (and then the store
    * necessarily declares a key — the MoR door refuses keyless
    * stores). `doomedCount(pv)` is the partition's recorded doomed-key
    * total, or None when any of its records predates the count field
    * (statistics then skip the subtraction — over-counting is the
    * sound direction).
    */
  final case class State(keyField: StructField,
                         records: Map[String, Seq[String]],
                         counts: Map[String, Seq[Long]]) {
    def doomedCount(pv: String): Option[Long] = {
      val ns = counts.getOrElse(pv, Nil)
      if (ns.isEmpty || ns.exists(_ < 0)) None else Some(ns.sum)
    }
  }

  def stateFor(root: JPath, version: Int,
               meta: SnapshotMeta.Meta): Option[State] = {
    val recs = SnapshotManifest.deleteRecordsWithCounts(root, version)
    if (recs.isEmpty) None
    else {
      val keyCol = meta.keyCol.getOrElse(throw new IllegalStateException(
        s"$root carries #delete records but table.meta declares no " +
          "key_column"))
      val f = SnapshotManifest.effectiveDataSchema(root, meta.dataSchema)
        .fields.find(_.name == keyCol).getOrElse(
          throw new IllegalStateException(
            s"key column $keyCol missing from the data schema"))
      Some(State(f.copy(nullable = true),
        recs.view.mapValues(_.map(_._1)).toMap,
        recs.view.mapValues(_.map(_._2)).toMap))
    }
  }
}

/** Anti-filter wrapper over a planned batch: rows whose key is doomed
  * are dropped as they stream out of the delegate's readers; when the
  * key column was INJECTED into the pruned read schema purely for this
  * filter (`dropInjectedKey`), it is projected back out so the scan
  * serves exactly the schema Spark asked for.
  */
private[sources] final class SnapshotDeleteBatch(
    delegate: org.apache.spark.sql.connector.read.Batch,
    rowSchema: StructType,
    keyIndex: Int,
    keyType: DataType,
    dropInjectedKey: Boolean,
    deleteDirs: Seq[String])
  extends org.apache.spark.sql.connector.read.Batch {

  override def planInputPartitions()
      : Array[org.apache.spark.sql.connector.read.InputPartition] =
    delegate.planInputPartitions()

  override def createReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory =
    new SnapshotDeleteReaderFactory(delegate.createReaderFactory(),
      rowSchema, keyIndex, keyType, dropInjectedKey, deleteDirs)
}

private[sources] final class SnapshotDeleteReaderFactory(
    delegate: org.apache.spark.sql.connector.read.PartitionReaderFactory,
    rowSchema: StructType,
    keyIndex: Int,
    keyType: DataType,
    dropInjectedKey: Boolean,
    deleteDirs: Seq[String])
  extends org.apache.spark.sql.connector.read.PartitionReaderFactory {

  override def supportColumnarReads(
      p: org.apache.spark.sql.connector.read.InputPartition): Boolean =
    false

  override def createReader(
      p: org.apache.spark.sql.connector.read.InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] = {
    val inner = delegate.createReader(p)
    val doomed = SnapshotDeletes.doomedKeys(deleteDirs, keyType)
    val proj: Option[UnsafeProjection] =
      if (!dropInjectedKey) None
      else Some(UnsafeProjection.create(
        rowSchema.fields.indices.filter(_ != keyIndex).map(i =>
          BoundReference(i, rowSchema.fields(i).dataType,
            nullable = true): Expression).toArray))
    new org.apache.spark.sql.connector.read.PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean = {
        while (inner.next()) {
          val r = inner.get()
          if (!doomed.contains(r, keyIndex)) { cur = r; return true }
        }
        false
      }
      override def get(): InternalRow =
        proj.map(_(cur)).getOrElse(cur)
      override def close(): Unit = inner.close()
    }
  }
}
