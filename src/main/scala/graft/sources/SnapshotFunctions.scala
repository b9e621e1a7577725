package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The snapshot store's V2 FUNCTION CATALOG: the layout transforms
  * (`bucket`, `truncate`, `days`/`months`/`years`/`hours`) as bound
  * Spark functions, so the engine itself can EVALUATE a declared
  * transform — which is what lets the write door require a clustered
  * distribution over `bucket(n, k)` / `days(ts)` and have Spark plan
  * the shuffle (`RequiresDistributionAndOrdering` resolves transform
  * expressions through the relation's `FunctionCatalog`; without one,
  * non-identity clustering cannot be expressed at all). The Iceberg
  * `SparkFunctions` shape (public docs), re-derived for this store.
  *
  * Every `produceResult` delegates to the SAME row twins the task
  * writers route with and the literal translator probes with
  * ([[SnapshotTransforms]]) — one definition of each transform,
  * shuffle/route/prune agreement by construction. The functions are
  * deterministic and null-intolerant (layout sources are non-null by
  * store invariant; a null input would have been refused at the door).
  */
object SnapshotFunctions {

  val names: Seq[String] =
    Seq("bucket", "truncate", "days", "months", "years", "hours")

  def load(name: String): Option[UnboundFunction] =
    name.toLowerCase(java.util.Locale.ROOT) match {
      case "bucket" => Some(BucketUnbound)
      case "truncate" => Some(TruncateUnbound)
      case "days" => Some(TemporalUnbound("days"))
      case "months" => Some(TemporalUnbound("months"))
      case "years" => Some(TemporalUnbound("years"))
      case "hours" => Some(HoursUnbound)
      case _ => None
    }

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Source value at `pos` as LONG — the bucket hash plane (integral
    * sources hash as LONG on every side, the Bloom lesson).
    */
  private def longAt(row: InternalRow, pos: Int, dt: DataType): Long =
    dt match {
      case ByteType => row.getByte(pos).toLong
      case ShortType => row.getShort(pos).toLong
      case IntegerType => row.getInt(pos).toLong
      case LongType => row.getLong(pos)
      case other => throw new IllegalStateException(s"bucket over $other")
    }

  /** `bucket(n, k)`: xxhash64 mod n — arguments arrive as (INT literal
    * n, source), the Spark `BucketTransform` calling convention.
    */
  private object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, col): xxhash64(col) mod n, the snapshot layout bucket"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2,
        s"bucket expects (n, col), got ${inputType.simpleString}")
      val nType = inputType.fields(0).dataType
      val srcType = inputType.fields(1).dataType
      require(integral(nType),
        s"bucket count must be integral, got ${nType.simpleString}")
      require(integral(srcType) || srcType == StringType,
        s"bucket source must be integral or string, got " +
          srcType.simpleString)
      new ScalarFunction[Int] {
        override def inputTypes(): Array[DataType] = Array(nType, srcType)
        override def resultType(): DataType = IntegerType
        override def name(): String = "bucket"
        override def canonicalName(): String = "graft.bucket"
        override def isResultNullable: Boolean = false
        override def produceResult(input: InternalRow): Int = {
          val n = longAt(input, 0, nType).toInt
          srcType match {
            case StringType =>
              SnapshotTransforms.bucketOfUtf8(input.getUTF8String(1), n)
            case dt => SnapshotTransforms.bucketOfLong(longAt(input, 1, dt), n)
          }
        }
      }
    }
  }

  /** `truncate(w, s)`: the first `w` chars — (INT literal w, STRING). */
  private object TruncateUnbound extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(w, col): char-count prefix, the snapshot layout truncate"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2,
        s"truncate expects (w, col), got ${inputType.simpleString}")
      val wType = inputType.fields(0).dataType
      require(integral(wType),
        s"truncate width must be integral, got ${wType.simpleString}")
      require(inputType.fields(1).dataType == StringType,
        s"truncate source must be STRING, got " +
          inputType.fields(1).dataType.simpleString)
      new ScalarFunction[UTF8String] {
        override def inputTypes(): Array[DataType] =
          Array(wType, StringType)
        override def resultType(): DataType = StringType
        override def name(): String = "truncate"
        override def canonicalName(): String = "graft.truncate"
        override def isResultNullable: Boolean = false
        override def produceResult(input: InternalRow): UTF8String =
          SnapshotTransforms.truncateUtf8(input.getUTF8String(1),
            longAt(input, 0, wType).toInt)
      }
    }
  }

  /** `days`/`months`/`years` over DATE or TIMESTAMP → DATE mirror
    * (UTC truncation for timestamps — the fixed-zone discipline of
    * [[SnapshotTransforms]]; DATE is already zone-free).
    */
  private final case class TemporalUnbound(fn: String)
    extends UnboundFunction {
    override def name(): String = fn
    override def description(): String =
      s"$fn(col): ${fn}-grain DATE mirror of a DATE/TIMESTAMP source (UTC)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 1,
        s"$fn expects one argument, got ${inputType.simpleString}")
      val srcType = inputType.fields(0).dataType
      require(srcType == DateType || srcType == TimestampType,
        s"$fn source must be DATE or TIMESTAMP, got ${srcType.simpleString}")
      new ScalarFunction[Int] {
        override def inputTypes(): Array[DataType] = Array(srcType)
        override def resultType(): DataType = DateType
        override def name(): String = fn
        override def canonicalName(): String = s"graft.$fn"
        override def isResultNullable: Boolean = false
        override def produceResult(input: InternalRow): Int = {
          val days = srcType match {
            case DateType => input.getInt(0)
            case TimestampType => DateTimeUtils.microsToDays(
              input.getLong(0), java.time.ZoneOffset.UTC)
            case other =>
              throw new IllegalStateException(s"$fn over $other")
          }
          fn match {
            case "days" => days
            case "months" => SnapshotTransforms.firstOfMonthDays(days)
            case "years" => SnapshotTransforms.firstOfYearDays(days)
          }
        }
      }
    }
  }

  /** `hours(ts)`: epoch-hour INT mirror — zone-free by construction. */
  private object HoursUnbound extends UnboundFunction {
    override def name(): String = "hours"
    override def description(): String =
      "hours(col): hours since the epoch of a TIMESTAMP source"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 1 &&
        inputType.fields(0).dataType == TimestampType,
        s"hours expects one TIMESTAMP argument, got " +
          inputType.simpleString)
      new ScalarFunction[Int] {
        override def inputTypes(): Array[DataType] = Array(TimestampType)
        override def resultType(): DataType = IntegerType
        override def name(): String = "hours"
        override def canonicalName(): String = "graft.hours"
        override def isResultNullable: Boolean = false
        override def produceResult(input: InternalRow): Int =
          SnapshotTransforms.epochHourOfMicros(input.getLong(0))
      }
    }
  }

  /** WRITE-SIDE CLUSTERING for the DSv2 doors
    * (`RequiresDistributionAndOrdering`): cluster by the layout
    * mirrors — each non-identity mirror as its transform over the
    * SOURCE column (resolved through this function catalog), identity
    * mirrors as the bare source reference — so a multi-task
    * INSERT/CTAS/overwrite shuffles every row of one partition into
    * ONE task and writes O(touched partitions) files per commit
    * instead of up to O(tasks × partitions). The small-file guard
    * hidden partitioning makes urgent: a `days × bucket` layout
    * multiplies leaf count, and at 100 TB an unclustered write
    * multiplies it again by the task count.
    */
  def clusterExprs(spec: StructType)
      : Array[org.apache.spark.sql.connector.expressions.Expression] = {
    import org.apache.spark.sql.connector.expressions.Expressions
    spec.fields.map { f =>
      val src = f.name.stripSuffix("_p")
      SnapshotTransforms.of(f) match {
        case SnapshotTransforms.Identity =>
          Expressions.column(src)
            : org.apache.spark.sql.connector.expressions.Expression
        case SnapshotTransforms.Days => Expressions.days(src)
        case SnapshotTransforms.Months => Expressions.months(src)
        case SnapshotTransforms.Years => Expressions.years(src)
        case SnapshotTransforms.Hours => Expressions.hours(src)
        case SnapshotTransforms.Bucket(n) => Expressions.bucket(n, src)
        case SnapshotTransforms.Truncate(w) =>
          Expressions.apply("truncate", Expressions.literal(w),
            Expressions.column(src))
      }
    }
  }

  /** In-task ordering to pair with [[clusterExprs]]: the cluster keys
    * first (rows of one partition stream contiguously, so the task
    * writer holds ONE open file at a time, not one per partition it
    * owns), then the table key within — sorted data files, which the
    * min/max stats sidecar turns into row-group skipping on key
    * probes.
    */
  def requiredOrdering(spec: StructType, keyCol: Option[String])
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}
    val key = keyCol.filterNot(k =>
      spec.fields.exists(f => f.name.stripSuffix("_p") == k &&
        SnapshotTransforms.of(f) == SnapshotTransforms.Identity))
    (clusterExprs(spec) ++ key.map(Expressions.column))
      .map(e => Expressions.sort(e, SortDirection.ASCENDING))
  }
}
