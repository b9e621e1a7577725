package graft.sources

import java.nio.file.{Files => JFiles, Path => JPath}

import scala.jdk.CollectionConverters._
import scala.util.Try

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, EqualTo, Expression, In, InSet, Literal, Predicate, XxHash64}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Manifest reader for the copy-on-write snapshot store
  * (`graft.operators.SourceQueries`' lakehouse module). A manifest is
  * an immutable `v<N>.manifest` file of `partitionValue \t dataDir`
  * lines; the publish protocol (private temp + atomic `link(2)` CAS)
  * lives with the commit path in `SourceQueries.writeManifest`. This
  * object is the READ half, shared between the relational snapshot
  * queries and the [[SnapshotFileIndex]] connector.
  */
object SnapshotManifest {
  /** Highest published version, or 0 if none. */
  def head(root: JPath): Int = {
    val mdir = root.resolve("manifests").toFile
    Option(mdir.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.matches("v\\d+\\.manifest"))
      .map(_.stripPrefix("v").stripSuffix(".manifest").toInt)
      .foldLeft(0)(math.max)
  }

  /** partitionValue -> data dir for one published version. */
  def read(root: JPath, version: Int): Map[String, String] =
    JFiles
      .readAllLines(root.resolve("manifests").resolve(s"v$version.manifest"))
      .asScala.map { l =>
        val Array(ym, p) = l.split('\t'); ym -> p
      }.toMap
}

/** Per-file Bloom bitsets for a snapshot table's point-lookup key.
  *
  * The round-8 `source_bloom_lookup` entry proved the IDEA (per-file
  * signatures prune a point lookup on an unclustered key) but its
  * matched-file list was driver-mediated: a Spark join produced the
  * paths, the driver `collect()`ed them (capped in r9) and re-passed
  * them to a second read. Here the same skipping runs INSIDE the
  * planner instead — [[SnapshotFileIndex.listFiles]] consults the
  * bitsets while answering the scan's file-listing call, exactly where
  * Delta/Iceberg evaluate their per-file stats — so there is no
  * second query, no path re-passing, and the plan is one ordinary
  * parquet scan whose input set is already pruned.
  *
  * Sizing: a FIXED 2^15-bit / k=4 bitset per file (4 KiB dense, less
  * sparse) makes the whole index O(files) metadata — unlike the
  * sorted-distinct-hash signature of `source_bloom_lookup`, whose
  * per-file size grows with rows/file. 10^6 files is ~4 GB of index: at
  * that scale a deployment loads only the bitsets of
  * manifest-surviving files (the load below already filters to the
  * version's files) or shards the index by partition; the harness
  * tables sit orders of magnitude below the cap. False positives cost
  * I/O never correctness: Spark re-applies every data filter after the
  * scan, same contract as parquet row-group stats.
  *
  * Both sides derive k positions from ONE `xxhash64` via standard
  * double hashing (Kirsch–Mitzenmacher): h1 = low 32 bits,
  * h2 = high 32 bits forced odd, pos_i = (h1 + i*h2) mod bits. The
  * write side is a Spark Column expression; the probe side evaluates
  * the SAME Catalyst `XxHash64` on the driver, so agreement is by
  * construction, not by re-implementation.
  */
object SnapshotBloom {
  val Bits = 1 << 15
  val K = 4

  /** Canonical file key: scheme-free absolute path, so the index rows
    * (written from `_metadata.file_path`, a `file:///...` URI) and the
    * FileIndex's `FileStatus` paths (`file:/...`) meet on one form.
    */
  def fileKey(p: String): String = new Path(p).toUri.getPath

  /** One map-side pass over the data dirs -> index parquet
    * (file, positions: sorted int array of set bits).
    */
  def build(s: SparkSession, dataDirs: Seq[String], keyCol: String,
            out: String): Unit = {
    // hash the key as LONG on both sides: xxhash64 of an IntegerType
    // column hashes 4 bytes while the driver probe hashes a Long
    // literal's 8 — without the cast an int-typed key column would
    // never match its own bloom bits and the lookup would silently
    // skip the right files
    val xx = xxhash64(col(keyCol).cast("long"))
    val h1 = xx.bitwiseAND(lit(0xFFFFFFFFL))
    val h2 = shiftrightunsigned(xx, 32).bitwiseOR(lit(1L))
    val posArr = array((0 until K).map(i =>
      pmod(h1 + lit(i.toLong) * h2, lit(Bits.toLong)).cast("int")): _*)
    s.read.parquet(dataDirs: _*)
      .select(col("_metadata.file_path").as("file"), explode(posArr).as("pos"))
      .groupBy(col("file"))
      .agg(sort_array(collect_set(col("pos"))).as("positions"))
      .write.mode("overwrite").parquet(out)
  }

  /** Load bitsets for (at most) the given file set — the membership
    * filter runs BEFORE bitset construction, so rows for files other
    * versions reference cost a string check, not a 4 KiB allocation.
    */
  def load(s: SparkSession, indexPath: String,
           files: Set[String]): Map[String, Array[Long]] =
    s.read.parquet(indexPath).collect().iterator.flatMap { r =>
      val key = fileKey(r.getString(0))
      if (!files.contains(key)) Iterator.empty
      else {
        val bits = new Array[Long](Bits / 64)
        r.getSeq[Int](1).foreach(p => bits(p >> 6) |= 1L << (p & 63))
        Iterator.single(key -> bits)
      }
    }.toMap

  /** Driver-side probe: the same xxhash64 + double-hash positions. */
  def mayContain(bits: Array[Long], key: Long): Boolean = {
    val xx = new XxHash64(Seq(Literal(key, LongType)), 42L)
      .eval(InternalRow.empty).asInstanceOf[Long]
    val h1 = xx & 0xFFFFFFFFL
    val h2 = (xx >>> 32) | 1L
    (0 until K).forall { i =>
      val p = ((h1 + i * h2) % Bits).toInt
      (bits(p >> 6) & (1L << (p & 63))) != 0
    }
  }
}

/** A snapshot version as a planner-integrated file listing — the
  * Delta-Lake integration shape (a custom `FileIndex` under a
  * `HadoopFsRelation`), reduced to the manifest store's minimum.
  *
  * What the planner gets for free once the listing is a FileIndex:
  *
  *   - '''Manifest partition pruning''': `listFiles` receives the
  *     query's partition filters and evaluates them against each
  *     manifest entry's partition value — a pruned month's dir is
  *     never listed, let alone scanned. The prior `snapshotRead`
  *     (plain `read.parquet(allDirs)`) scanned every partition of the
  *     version regardless of predicate.
  *   - '''Bloom file skipping''': equality / IN data filters on the
  *     declared point-lookup key drop files whose bitset excludes all
  *     candidate keys ([[SnapshotBloom]]) — inside the same planning
  *     call, no driver-mediated path list.
  *   - '''Everything downstream unchanged''': parquet row-group stats,
  *     column pruning, filter pushdown, AQE all apply — the scan node
  *     is an ordinary `FileSourceScanExec` over parquet.
  *
  * The index is version-pinned and immutable (snapshot data dirs are
  * write-once; `refresh()` is a no-op), so concurrent commits never
  * shift a running query — the isolation property the manifest store
  * already guarantees, now carried by the scan itself.
  */
final class SnapshotFileIndex(
    spark: SparkSession,
    root: JPath,
    val version: Int,
    partitionCol: String = "o_ym_p",
    bloomKey: Option[String] = None) extends FileIndex {

  private val manifest: Map[String, String] = SnapshotManifest.read(root, version)

  override val partitionSchema: StructType =
    StructType(Seq(StructField(partitionCol, StringType, nullable = true)))

  /** month -> listed parquet files, materialized once (metadata-sized:
    * O(files) FileStatus, the same class of driver state as the
    * manifest itself).
    */
  private val filesByPartition: Seq[(String, Array[FileStatus])] = {
    val conf = spark.sparkContext.hadoopConfiguration
    manifest.toSeq.sortBy(_._1).map { case (pv, dir) =>
      val p = new Path(dir)
      val fs = p.getFileSystem(conf)
      val listed = fs.listStatus(p).filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      pv -> listed
    }
  }

  private val bloomBits: Map[String, Array[Long]] = bloomKey match {
    case Some(_) =>
      val mine = filesByPartition.iterator.flatMap(_._2)
        .map(st => SnapshotBloom.fileKey(st.getPath.toString)).toSet
      SnapshotBloom.load(spark, root.resolve("bloomidx").toString, mine)
    case None => Map.empty
  }

  /** Observability hook for specs: (partitions, files) the last
    * `listFiles` call actually served to the scan.
    */
  @volatile var lastListing: (Int, Int) = (-1, -1)

  override def rootPaths: Seq[Path] = manifest.values.toSeq.sorted.map(new Path(_))

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val keptPartitions = prunePartitions(partitionFilters)
    val candidateKeys = bloomCandidateKeys(dataFilters)
    val out = keptPartitions.map { case (pv, files) =>
      val kept = candidateKeys match {
        case Some(conjuncts) => files.filter { st =>
          bloomBits.get(SnapshotBloom.fileKey(st.getPath.toString)) match {
            // every key-conjunct must have at least one maybe-present key
            case Some(bits) => conjuncts.forall(_.exists(SnapshotBloom.mayContain(bits, _)))
            case None => true // unindexed file: never skip
          }
        }
        case None => files
      }
      PartitionDirectory(
        InternalRow(UTF8String.fromString(pv)), kept)
    }.filter(_.files.nonEmpty)
    lastListing = (out.size, out.map(_.files.size).sum)
    out
  }

  /** Evaluate the partition filters against each manifest entry's
    * partition value. For a `HadoopFsRelation`, FileSourceStrategy
    * REMOVES deterministic partition-only filters from the post-scan
    * filter set — honoring them here is a CORRECTNESS obligation, not
    * an optimization, so an unbindable filter shape fails loudly
    * rather than silently listing extra partitions whose rows nothing
    * downstream would re-filter.
    */
  private def prunePartitions(partitionFilters: Seq[Expression])
      : Seq[(String, Array[FileStatus])] =
    partitionFilters.reduceOption(And) match {
      case None => filesByPartition
      case Some(pred) =>
        val bound = Try {
          val p = Predicate.createInterpreted(pred.transform {
            case a: AttributeReference =>
              val idx = partitionSchema.fieldIndex(a.name)
              BoundReference(idx, partitionSchema(idx).dataType, nullable = true)
          })
          p.initialize(0)
          p
        }.getOrElse(throw new IllegalStateException(
          s"cannot bind partition filter $pred against " +
            s"$partitionSchema — refusing to scan unpruned"))
        filesByPartition.filter { case (pv, _) =>
          bound.eval(InternalRow(UTF8String.fromString(pv)))
        }
    }

  /** Per-conjunct candidate key sets for the bloom key: `k = lit`,
    * `k IN (lits)` (and the post-OptimizeIn `InSet` form). A conjunct
    * that isn't a literal equality on the key contributes nothing —
    * file skipping only ever uses a sound SUBSET of the filters.
    */
  private def bloomCandidateKeys(dataFilters: Seq[Expression])
      : Option[Seq[Seq[Long]]] = bloomKey.flatMap { kc =>
    def asLong(v: Any): Option[Long] = v match {
      case l: Long => Some(l)
      case i: Int  => Some(i.toLong)
      case _       => None
    }
    val conjuncts = dataFilters.flatMap {
      case EqualTo(a: AttributeReference, Literal(v, _)) if a.name == kc =>
        asLong(v).map(Seq(_))
      case EqualTo(Literal(v, _), a: AttributeReference) if a.name == kc =>
        asLong(v).map(Seq(_))
      case In(a: AttributeReference, list) if a.name == kc &&
          list.forall(_.isInstanceOf[Literal]) =>
        val ks = list.map { case Literal(v, _) => asLong(v) }
        if (ks.forall(_.isDefined)) Some(ks.flatten) else None
      case InSet(a: AttributeReference, hset) if a.name == kc =>
        val ks = hset.toSeq.map(asLong)
        if (ks.forall(_.isDefined)) Some(ks.flatten) else None
      case _ => None
    }
    if (conjuncts.isEmpty) None else Some(conjuncts)
  }

  override def inputFiles: Array[String] =
    filesByPartition.flatMap(_._2.map(_.getPath.toString)).toArray

  override def refresh(): Unit = () // snapshot versions are immutable

  override def sizeInBytes: Long =
    filesByPartition.iterator.flatMap(_._2).map(_.getLen).sum
}

/** User-facing constructors for snapshot-version DataFrames backed by
  * [[SnapshotFileIndex]].
  */
object SnapshotTable {
  /** The relation (also used by the `graft-snapshot` format). */
  def relation(s: SparkSession, root: JPath, version: Int,
               bloomKey: Option[String] = None,
               partitionCol: String = "o_ym_p"): HadoopFsRelation = {
    val index = new SnapshotFileIndex(s, root, version, partitionCol, bloomKey)
    val dataDir = SnapshotManifest.read(root, version).values.toSeq.sorted.headOption
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot v$version of $root has no partitions"))
    val dataSchema = s.read.parquet(dataDir).schema
    HadoopFsRelation(index, index.partitionSchema, dataSchema, None,
      new ParquetFileFormat, Map.empty[String, String])(s)
  }

  def read(s: SparkSession, root: JPath, version: Int,
           bloomKey: Option[String] = None,
           partitionCol: String = "o_ym_p"): DataFrame =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .baseRelationToDataFrame(relation(s, root, version, bloomKey, partitionCol))

  /** The FileIndex behind a DataFrame built by [[read]] — spec hook. */
  def fileIndexOf(df: DataFrame): SnapshotFileIndex = {
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    df.queryExecution.analyzed.collectFirst {
      case LogicalRelation(r: HadoopFsRelation, _, _, _, _)
        if r.location.isInstanceOf[SnapshotFileIndex] =>
        r.location.asInstanceOf[SnapshotFileIndex]
    }.getOrElse(throw new IllegalStateException("no SnapshotFileIndex in plan"))
  }
}

/** The DataFrameReader/Writer door to [[SnapshotTable]].
  *
  * Read: `spark.read.format("graft-snapshot").option("version", 2)
  * .option("bloomKey", "o_orderkey").load(root)`. Options: `version`
  * (default: head), `bloomKey` (default: none), `partitionCol`
  * (default `o_ym_p`).
  *
  * Write: `df.write.format("graft-snapshot").mode("append")
  * .option("commitMode", "upsert" | "delete").save(root)` — the frame
  * is the commit's DELTA, applied copy-on-write against the current
  * head through the store's CAS manifest publish. An empty root
  * bootstraps to v1. On a CAS conflict the commit REBASES: it
  * re-reads the new head and re-applies the same key-based delta —
  * sound because upsert/delete deltas are defined per key, not
  * relative to a snapshot's values. Only `SaveMode.Append` is
  * accepted: a snapshot store never overwrites history — that is the
  * point of it. Options: `keyCol` (default `o_orderkey`), `partCol`
  * (default `o_ym`), `commitMode` (default `upsert`).
  */
final class SnapshotSourceProvider extends RelationProvider
    with org.apache.spark.sql.sources.CreatableRelationProvider
    with DataSourceRegister {
  override def shortName(): String = "graft-snapshot"

  private def opt(parameters: Map[String, String], k: String): Option[String] =
    parameters.get(k.toLowerCase).orElse(parameters.get(k))

  override def createRelation(ctx: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val root = java.nio.file.Paths.get(parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-snapshot needs a path")))
    val version = opt(parameters, "version").map(_.toInt)
      .getOrElse(SnapshotManifest.head(root))
    SnapshotTable.relation(ctx.sparkSession, root, version,
      opt(parameters, "bloomKey"),
      opt(parameters, "partitionCol").getOrElse("o_ym_p"))
  }

  override def createRelation(ctx: SQLContext,
                              mode: org.apache.spark.sql.SaveMode,
                              parameters: Map[String, String],
                              data: org.apache.spark.sql.DataFrame): BaseRelation = {
    require(mode == org.apache.spark.sql.SaveMode.Append,
      s"graft-snapshot only supports SaveMode.Append (a snapshot store " +
        s"never overwrites history); got $mode")
    val root = java.nio.file.Paths.get(parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-snapshot needs a path")))
    val keyCol = opt(parameters, "keyCol").getOrElse("o_orderkey")
    val partCol = opt(parameters, "partCol").getOrElse("o_ym")
    val insert = opt(parameters, "commitMode").getOrElse("upsert") match {
      case "upsert" => true
      case "delete" => false
      case other => throw new IllegalArgumentException(
        s"commitMode must be upsert or delete, got $other")
    }
    val spark = ctx.sparkSession
    java.nio.file.Files.createDirectories(root)
    // CAS retry loop: of N racers exactly one publishes each version;
    // losers rebase on the new head and re-apply the key-based delta
    val MaxAttempts = 5
    var attempt = 0
    var committed = false
    while (!committed) {
      val head = SnapshotManifest.head(root)
      try {
        if (head == 0)
          graft.operators.SourceQueries.snapshotInit(spark, root, data, partCol)
        else
          graft.operators.SourceQueries.snapshotCommit(spark, root, head,
            head + 1, data, insert, keyCol, partCol)
        committed = true
      } catch {
        case e: graft.operators.SourceQueries.SnapshotConflictException =>
          attempt += 1
          if (attempt >= MaxAttempts) throw e
      }
    }
    createRelation(ctx, parameters)
  }
}
