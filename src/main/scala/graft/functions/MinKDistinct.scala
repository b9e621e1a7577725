package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst aggregate: the `k` smallest DISTINCT string values of
  * `child`, returned as a sorted array.
  *
  * Why a custom expression instead of `sort_array(collect_set(x))[1:k]`:
  * `collect_set` has unbounded buffer state — every distinct value of the
  * group crosses the shuffle — while this aggregate's state is a bounded
  * sorted set of ≤ k strings, and partial aggregation runs map-side. For
  * document fingerprinting (doc_fingerprint: millions of 8-gram hashes
  * per doc at 100 TB) that turns an O(|grams|) shuffle into an O(k) one.
  * This is the `TypedImperativeAggregate` route recommended in
  * SURVEY.md §4.2 for bounded-memory holistic aggregates.
  */
@ExpressionDescription(
  usage = "_FUNC_(expr, k) - Returns the k smallest distinct string " +
    "values of expr as a sorted array.")
case class MinKDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[String]] {

  require(k > 0, "min_k requires k > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): mutable.TreeSet[String] =
    mutable.TreeSet.empty[String]

  private def add(buf: mutable.TreeSet[String], v: String): Unit = {
    // skip values that can't make the top-k (cheap pre-check first)
    if (buf.size < k) { buf += v; () }
    else if (v < buf.last) { buf += v; if (buf.size > k) buf -= buf.last }
  }

  override def update(buf: mutable.TreeSet[String],
                      input: InternalRow): mutable.TreeSet[String] = {
    val v = child.eval(input)
    // toString copies out of Spark's reused UTF8String buffer
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: mutable.TreeSet[String],
                     other: mutable.TreeSet[String]): mutable.TreeSet[String] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[String]): Any =
    new GenericArrayData(buf.toArray.map(UTF8String.fromString))

  override def serialize(buf: mutable.TreeSet[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeUTF)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeSet.empty[String]
    var i = 0
    while (i < n) { buf += in.readUTF(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinKDistinct =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_min_k"
}
