package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `sorted_intersect_size(a, b)`: |a ∩ b| for two SORTED, DISTINCT
  * string arrays, as a single forward merge — zero allocation, O(|a|+|b|)
  * byte comparisons, fully codegen'd.
  *
  * Why not `size(array_intersect(...))`: the exact-verify stage of every
  * near-dup operator (n-gram prefix-filter, MinHash-LSH, the audits)
  * computes one set intersection PER CANDIDATE PAIR. Spark's
  * `ArrayIntersect` builds a fresh `OpenHashSet` (plus NaN/null wrapper
  * closures) for every row and materializes the intersection array when
  * only its size is needed. At 10× stress on the round-8 corpus the
  * prefix path emits ~31M candidate pairs — the hash-set formulation
  * burned 10+ CPU-minutes in that stage alone; a merge over pre-sorted
  * arrays is pure pointer-walking and needs no per-row state.
  *
  * Contract (holds at every call site; NOT a general array_intersect
  * replacement): both inputs sorted ascending by UTF8String binary order
  * — exactly `array_sort`'s ordering, so `array_sort(array_distinct(x))`
  * upstream is the canonical producer — with distinct elements and nulls
  * (if any) last. A null element matches only another null, mirroring
  * `array_intersect` null semantics on distinct inputs.
  *
  * The sort is paid ONCE PER DOCUMENT (before the pair join fans each doc
  * out to its candidates), so per-pair cost stays linear while the
  * per-doc sort amortizes across every pair the doc appears in.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_size requires two array<string>, got " +
          s"${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectSize.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.SortedIntersectSize.count($l, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {

  /** Forward merge over two sorted distinct arrays. Nulls sort last
    * (array_sort's placement); null == null counts as a match. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      val x = a.getUTF8String(i)
      val y = b.getUTF8String(j)
      if (x == null || y == null) {
        // null region: nulls are last, so the remaining merge is null-only
        if (x == null && y == null) { n += 1; i += 1; j += 1 }
        else if (x == null) j += 1 // y < null: advance the non-null side
        else i += 1
      } else {
        // binaryCompare, NOT compareTo: Spark 4's collation-aware
        // compareTo routes through SparkEnvUtils.isTesting — a
        // System.getenv call per comparison (µs-scale; jstack showed the
        // verify stage spending its CPU in ProcessEnvironment.get).
        // StringType's sort order (what array_sort produced upstream) IS
        // binary order, so binaryCompare is the semantically exact and
        // allocation-free comparator here.
        val c = x.binaryCompare(y)
        if (c == 0) { n += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    n
  }

  def sorted_intersect_size(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectSize(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
