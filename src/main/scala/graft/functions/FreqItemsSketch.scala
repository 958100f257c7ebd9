package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch as a native
  * [[TypedImperativeAggregate]]: at most `capacity` (item, count) counters
  * per aggregation buffer, single pass, mergeable — the standard bounded-
  * memory answer to "what are the heavy hitters?" over a corpus too large
  * to count exactly per token.
  *
  * Guarantees (Misra–Gries 1982; merge rule per Agarwal et al., "Mergeable
  * Summaries", PODS 2012): with n = total items observed and k = capacity,
  *   - every item with true count > n/(k+1) is IN the summary;
  *   - each reported count c̃ satisfies  c_true − n/(k+1) ≤ c̃ ≤ c_true.
  * Merge combines counts then subtracts the (k+1)-th largest combined
  * count from every counter and drops the non-positive ones — associative
  * error composition, so partial aggregation (map-side combine) is safe.
  *
  * Determinism note: like any MG instance, the EXACT surviving counter set
  * below the guarantee threshold depends on arrival/merge order. Declared
  * queries therefore either (a) run in the exact regime — capacity chosen
  * ≥ distinct items, where no decrement ever fires and the sketch IS the
  * exact count map regardless of order — or (b) assert the order-invariant
  * guarantees via an audit companion, the same pattern as the HLL/MinHash
  * audits. At 100 TB regime (b) is the production mode: counters per
  * buffer stay O(capacity) while a groupBy-count of raw tokens would
  * shuffle billions of distinct keys.
  *
  * Reference context: the reference's corpus never needs sketching (it
  * averages a few thousand numeric rows); this op is part of the
  * training-data tier (token/domain/url frequency over web-scale text).
  */
case class FreqItemsSketch(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGSummary] with UnaryLike[Expression] {

  override def prettyName: String = "freq_items_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (capacity <= 0)
      TypeCheckResult.TypeCheckFailure(s"capacity must be positive, got $capacity")
    else if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"freq_items_sketch requires a string item, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): MGSummary = new MGSummary(capacity)

  override def update(buf: MGSummary, input: InternalRow): MGSummary = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MGSummary, other: MGSummary): MGSummary = {
    buf.mergeIn(other)
    buf
  }

  /** array<struct<item,cnt>> ordered (cnt DESC, item ASC). */
  override def eval(buf: MGSummary): Any =
    new GenericArrayData(buf.sorted.map {
      case (item, cnt) => InternalRow(UTF8String.fromString(item), cnt)
    })

  override def serialize(buf: MGSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeInt(buf.counters.size)
    buf.counters.foreach { case (item, cnt) =>
      // length-prefixed UTF-8, not writeUTF: a single token over 64 KiB
      // (binary-ish garbage in a web corpus) must not kill the exchange
      val b = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(cnt)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MGSummary(capacity)
    buf.n = in.readLong()
    val m = in.readInt()
    var i = 0
    while (i < m) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf.counters.update(
        new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqItemsSketch =
    copy(child = newChild)
}

/** Mutable MG state: ≤ capacity counters + the observed-item total `n`
  * (carried for the error bound n/(k+1), not part of the result). */
final class MGSummary(capacity: Int) {
  private[functions] val counters = scala.collection.mutable.HashMap.empty[String, Long]
  private[functions] var n: Long = 0L

  def offer(item: String): Unit = {
    n += 1
    counters.get(item) match {
      case Some(c) => counters.update(item, c + 1)
      case None if counters.size < capacity => counters.update(item, 1L)
      case None =>
        // decrement-all; evict zeros (classic MG step, O(capacity) but
        // fires at most once per capacity distinct non-resident arrivals)
        val dead = List.newBuilder[String]
        counters.mapValuesInPlace { (k, c) => if (c == 1) { dead += k; 0 } else c - 1 }
        dead.result().foreach(counters.remove)
    }
  }

  def mergeIn(other: MGSummary): Unit = {
    n += other.n
    other.counters.foreach { case (item, c) =>
      counters.update(item, counters.getOrElse(item, 0L) + c)
    }
    if (counters.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything
      val cuts = counters.values.toArray
      java.util.Arrays.sort(cuts)
      val cut = cuts(cuts.length - capacity - 1)
      val dead = counters.collect { case (k, c) if c <= cut => k }.toList
      dead.foreach(counters.remove)
      counters.mapValuesInPlace((_, c) => c - cut)
    }
  }

  /** (cnt DESC, item ASC) — a total, order-independent rank. */
  def sorted: Array[(String, Long)] =
    counters.toArray.sortBy { case (item, cnt) => (-cnt, item) }
}

object FreqItemsSketch {
  /** Column-API entry: `freq_items_sketch(item, capacity)` aggregate —
    * array<struct<item,cnt>> ordered (cnt DESC, item ASC). */
  def freq_items_sketch(item: Column, capacity: Int): Column =
    ColumnBridge.column(
      FreqItemsSketch(ColumnBridge.expression(item), capacity)
        .toAggregateExpression())
}
