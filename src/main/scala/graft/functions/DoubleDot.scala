package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** IEEE-double dot product of two float vectors, summed left to right —
  * bit-identical to the declarative `aggregate(zip_with(a, b,
  * (x,y) -> double(x)*double(y)), 0.0, +)` chain it replaces: same
  * widening, same product, same accumulation order, and the SAME null
  * semantics — zip_with pads a length mismatch with nulls and `+` over a
  * null poisons the fold, so any null element or unequal lengths yield
  * NULL here too (not a partial sum). One tight loop per row instead of
  * Spark's interpreted higher-order-function walk.
  * This is the ANN rerank kernel: cosine on LSH bucket candidates, where
  * exact decimal ranking ([[DecimalDot]]) isn't needed.
  */
case class DoubleDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null elements / length mismatch
  override def prettyName: String = "double_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"double_dot requires two array<float>, got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    DoubleDot.dotOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val t = ctx.freshName("dotRes")
      s"""java.lang.Double $t = graft.functions.DoubleDot.dotOrNull($l, $r);
         |if ($t == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $t.doubleValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleDot =
    copy(left = newLeft, right = newRight)
}

object DoubleDot {
  /** The kernel — static so generated code can call it directly. Returns
    * null (not a partial sum) on length mismatch or any null element,
    * exactly like the zip_with/aggregate chain. */
  def dotOrNull(x: ArrayData, y: ArrayData): java.lang.Double = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** Column-API entry point. */
  def double_dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DoubleDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
