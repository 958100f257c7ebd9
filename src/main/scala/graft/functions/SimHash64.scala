package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a token array (Charikar 2002): per-token xxhash64,
  * signed bit-count accumulation, sign → output bit. Near-identical token
  * multisets yield small Hamming distance, enabling band-bucketed near-dup
  * joins (see DedupOps.q_dedup_simhash).
  *
  * Custom Catalyst `Expression` rather than a Scala UDF: operates directly
  * on `ArrayData`/`UTF8String` with zero boxing or conversion, and reuses
  * Spark's own xxhash64 kernel. CodegenFallback is acceptable here — the
  * expression is itself a tight per-row loop; the surrounding plan stays
  * whole-stage-codegen'd.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHash64.hashArray(input.asInstanceOf[ArrayData]))

  /** Generated code calls the static kernel — one virtual call per row,
    * but the surrounding operators stay inside whole-stage codegen
    * (CodegenFallback would demote the entire stage to interpreted
    * projection). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.hashArray($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** The kernel — static so generated code can call it directly. */
  def hashArray(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column-API entry point (Spark 4: Column wraps a ColumnNode, so the
    * catalyst bridge goes through ExpressionUtils). */
  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))
}
