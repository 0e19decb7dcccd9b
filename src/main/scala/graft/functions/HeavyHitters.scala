package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy hitters as a native Spark aggregate
  * (`TypedImperativeAggregate`): a bounded summary of at most `k` counters
  * per group, merged associatively across partitions — the standard sketch
  * for "which tokens dominate this corpus slice" when the true item
  * cardinality is unbounded and a full `groupBy(item).count` per group is
  * its own shuffle of the whole corpus.
  *
  * Guarantees (classic Misra–Gries, and the Agarwal et al. mergeability
  * result for the merge step): with n items in the group, every estimate
  * undercounts by at most n/(k+1), so any item with true frequency
  * > n/(k+1) is guaranteed present; when the group's distinct-item count
  * never exceeds k, no decrements fire and every count is EXACT — the
  * regime q43's DuckDB oracle checks bitwise. The approximate regime's
  * bounds are pinned by ScalaTest.
  *
  * State is a hash map of at most k (item, count) entries; serialization
  * is a flat (size, [len, bytes, count]*) frame. The decrement step is
  * O(k) worst case per new item at capacity — amortized fine: each
  * decrement pays back an earlier increment.
  *
  * Returns array<struct<item string, count long>> sorted by (count desc,
  * item asc).
  */
/** The Misra–Gries buffer algebra, shared by the batch aggregate below and
  * the streaming state operator
  * ([[graft.streaming.StreamingEvents.streamingHeavyHitters]]) — one
  * implementation of the error-bound-carrying steps, tested once
  * (`PropertySpec` exercises it through the aggregate; the streaming spec
  * pins stream-equals-batch on top of the same core).
  */
object MisraGriesCore {

  /** One observation: increment a tracked item, admit into a free slot, or
    * run the decrement-all step at capacity.
    */
  def observe(buf: mutable.HashMap[String, Long], s: String, k: Int): Unit =
    buf.get(s) match {
      case Some(c) => buf(s) = c + 1
      case None if buf.size < k => buf(s) = 1L
      case None =>
        // at capacity with an untracked item: the Misra–Gries step —
        // decrement every counter, dropping zeros (frees slots for
        // later items; the new item itself is "cancelled" against them)
        buf.keys.toArray.foreach { key =>
          val c = buf(key) - 1
          if (c == 0L) buf.remove(key) else buf(key) = c
        }
    }

  /** Merge `b2` into `b1` (mergeable-summaries rule: add, then subtract
    * the (k+1)-th largest count and keep positives; error stays ≤ n/(k+1)).
    */
  def mergeInto(b1: mutable.HashMap[String, Long],
                b2: collection.Map[String, Long], k: Int): mutable.HashMap[String, Long] = {
    b2.foreach { case (s, c) => b1(s) = b1.getOrElse(s, 0L) + c }
    if (b1.size > k) {
      val sub = b1.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      b1.keys.toArray.foreach { key =>
        val c = b1(key) - sub
        if (c <= 0L) b1.remove(key) else b1(key) = c
      }
    }
    b1
  }

  /** Canonical presentation order: (count desc, item asc). */
  def sorted(buf: collection.Map[String, Long]): Array[(String, Long)] =
    buf.toArray.sortBy { case (item, c) => (-c, item) }
}

case class MisraGries(child: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with UnaryLike[Expression] {

  require(k > 0, s"heavy_hitters needs a positive counter budget, got $k")

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType), StructField("count", LongType))),
    containsNull = false)
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null)
      MisraGriesCore.observe(buf, v.asInstanceOf[UTF8String].toString, k)
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
                     b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] =
    MisraGriesCore.mergeInto(b1, b2, k)

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(MisraGriesCore.sorted(buf).map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    })

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      val b = s.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf(new String(b, "UTF-8")) = in.readLong()
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}
