package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton / Z-order curve key: interleaves the low `bits` bits of two
  * non-negative longs (x in the even positions, y in the odd ones), so
  * lexicographic order on the key is locality-preserving in BOTH
  * dimensions — rows close on the curve are close in (x, y).
  *
  * Why it exists: sorting a table by ONE column gives parquet row-group
  * min/max pruning on that column only; a 100 TB fact table queried by
  * two independent dimensions (time and account, part and supplier)
  * needs a layout whose sort key localizes both at once. Writing
  * `repartitionByRange(zorder_key(x, y))` + sort-within-partitions
  * yields files whose per-file (x, y) bounding boxes are small squares
  * instead of full-width stripes — the OPTIMIZE ZORDER technique of the
  * lakehouse engines, here as a plain deterministic expression any
  * writer can use.
  *
  * Callers bound the inputs into [0, 2^bits) (mask/modulo/bucketize);
  * values outside that range simply contribute their low bits.
  */
case class ZOrderKey(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"zorder_key requires two bigint, got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKey.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.ZOrderKey.interleave($l, $r, ${this.bits});")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey {

  /** The kernel — static so generated code calls it directly. */
  def interleave(x: Long, y: Long, bits: Int): Long = {
    var out = 0L
    var i = 0
    while (i < bits) {
      out |= ((x >> i) & 1L) << (2 * i)
      out |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    out
  }

  /** Column-API entry point. */
  def zorder_key(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(
      ZOrderKey(ColumnBridge.expression(x), ColumnBridge.expression(y), bits))
}
