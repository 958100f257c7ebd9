package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer squared L2 distance between two long vectors:
  * Σ (aᵢ − bᵢ)² over min(|a|, |b|) elements — the k-means assignment
  * kernel over [[DecimalScale6]] scale-6 unscaled vectors (result is
  * scale-12 unscaled; ≤ 64·(4e6)² ≈ 1e15, far inside a long).
  *
  * Why an expression: the declarative formulation
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0, +)` walks two
  * boxed higher-order lambdas per element — Spark evaluates HOF lambdas
  * interpreted, and the assignment stage scores |corpus| × K pairs per
  * Lloyd iteration. This kernel is one static call wrapping a primitive
  * loop, same shape as [[ScaledDot]] (the similarity tier's scorer).
  *
  * Null elements are the caller's problem by contract (ClusterOps
  * filters them corpus-side); the kernel treats arrays as primitive
  * long storage.
  */
case class LongDist2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "long_dist2"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"long_dist2 requires two array<bigint>, got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    LongDist2.dist2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.LongDist2.dist2($l, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDist2 =
    copy(left = newLeft, right = newRight)
}

object LongDist2 {

  /** The kernel — static so generated code calls it directly. */
  def dist2(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Column-API entry point. */
  def long_dist2(a: Column, b: Column): Column =
    ColumnBridge.column(
      LongDist2(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
