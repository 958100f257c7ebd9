package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Symmetric int8 scalar-quantization audit in one pass: for a float
  * vector, q_i = round(127 · x_i / max|x|) and the result is the exact
  * integer stats struct (sum, max, min, zero count) that
  * `q_embed_quantize` reports.
  *
  * Bit-identical to the declarative chain it replaces — max|x| via the
  * same double widening, the same IEEE product/division, and the same
  * HALF_UP decimal rounding Spark's `round` applies to doubles
  * (BigDecimal.valueOf semantics) — but two tight loops per row instead
  * of four interpreted higher-order-function walks (abs-transform,
  * array_max, quantize-transform, aggregate + filter + array_min/max).
  */
case class Int8QuantStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = Int8QuantStats.outType
  override def prettyName: String = "int8_quant_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"int8_quant_stats requires array<float>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    Int8QuantStats.stats(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Int8QuantStats.stats($c);")

  override protected def withNewChildInternal(newChild: Expression): Int8QuantStats =
    copy(child = newChild)
}

object Int8QuantStats {
  // sum/max/min are nullable: an empty or all-null-element vector has no
  // codes, and DuckDB's list_sum/list_max/list_min return NULL there —
  // Long.MinValue/MaxValue sentinels would silently diverge from the
  // oracle. n_zero stays non-null (len(list_filter(…)) of an empty or
  // all-NULL list is 0, not NULL).
  val outType: StructType = StructType(Seq(
    StructField("sum_q", LongType, nullable = true),
    StructField("max_q", LongType, nullable = true),
    StructField("min_q", LongType, nullable = true),
    StructField("n_zero", LongType, nullable = false)))

  /** Spark's Round-on-double semantics, exactly. */
  private def roundHalfUp(d: Double): Long =
    JBigDecimal.valueOf(d).setScale(0, RoundingMode.HALF_UP).longValue()

  /** The kernel — static so generated code can call it directly. */
  def stats(x: ArrayData): InternalRow = {
    val n = x.numElements()
    var maxabs = Double.NegativeInfinity
    var i = 0
    while (i < n) { // pass 1: max|x| with the declarative double widening
      if (!x.isNullAt(i)) {
        val a = math.abs(x.getFloat(i).toDouble)
        if (a > maxabs) maxabs = a
      }
      i += 1
    }
    var sum = 0L
    var maxQ = Long.MinValue
    var minQ = Long.MaxValue
    var zeros = 0L
    var seen = 0L
    i = 0
    while (i < n) { // pass 2: quantize + stats
      if (!x.isNullAt(i)) {
        val q =
          if (maxabs == 0.0) 0L
          else roundHalfUp(x.getFloat(i).toDouble * 127.0 / maxabs)
        seen += 1
        sum += q
        if (q > maxQ) maxQ = q
        if (q < minQ) minQ = q
        if (q == 0L) zeros += 1
      }
      i += 1
    }
    // no codes → NULL stats (list_sum/list_max/list_min semantics), but
    // n_zero = 0 (an empty filter result still has a length)
    if (seen == 0L) InternalRow(null, null, null, 0L)
    else InternalRow(sum, maxQ, minQ, zeros)
  }

  /** Column-API entry point. */
  def int8_quant_stats(c: Column): Column =
    ColumnBridge.column(Int8QuantStats(ColumnBridge.expression(c)))
}
