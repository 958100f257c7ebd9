package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed rolling-hash document fingerprint (Schleimer, Wilkerson,
  * Aiken 2003 — the MOSS algorithm).
  *
  * A Rabin–Karp polynomial rolling hash (base 257, mod 2^64 via native
  * long overflow) slides a k-byte window over the document; winnowing
  * then keeps the minimum hash of every w consecutive k-gram hashes
  * (rightmost-minimum rule), guaranteeing any match of length
  * >= w + k - 1 between two documents shares at least one selected
  * fingerprint. Output is the sorted distinct fingerprint array —
  * order-canonical so downstream set operations are deterministic.
  *
  * One pass, O(n): the rolling update costs two multiply-adds per byte,
  * and the window minimum is maintained with a monotone deque.
  */
case class RollingWinnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 2 && w >= 1, s"need k >= 2, w >= 1; got k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_winnow"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_winnow requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    RollingWinnow.winnow(input.asInstanceOf[UTF8String], this.k, this.w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingWinnow.winnow($c, ${this.k}, ${this.w});")

  override protected def withNewChildInternal(newChild: Expression): RollingWinnow =
    copy(child = newChild)
}

object RollingWinnow {
  private val Base = 257L

  /** The kernel — static so generated code can call it directly. */
  def winnow(s: UTF8String, k: Int, w: Int): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length - k + 1 // number of k-grams
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    // base^(k-1) for the rolling subtract
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= Base; i += 1 }
    val hashes = new Array[Long](n)
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + (bytes(i) & 0xff); i += 1 }
    hashes(0) = h
    i = 1
    while (i < n) {
      h = (h - (bytes(i - 1) & 0xff) * pow) * Base + (bytes(i + k - 1) & 0xff)
      hashes(i) = h
      i += 1
    }
    // winnow: rightmost minimum of each w-window, via monotone deque
    val selected = new java.util.TreeSet[java.lang.Long]()
    val deque = new Array[Int](n)
    var head = 0; var tail = 0 // [head, tail) holds candidate indices
    i = 0
    while (i < n) {
      // popping on >= keeps the RIGHTMOST of equal minima (winnowing rule)
      while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) selected.add(hashes(deque(head)))
      i += 1
    }
    if (n < w) selected.add(hashes(deque(head))) // doc shorter than a window
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def rolling_winnow(c: Column, k: Int, w: Int): Column =
    ColumnBridge.column(RollingWinnow(ColumnBridge.expression(c), k, w))
}
