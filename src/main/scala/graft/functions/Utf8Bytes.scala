package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The UTF-8 byte values (0–255) of a string, as `array<int>` — the
  * byte-level fallback alphabet of a GPT-2-class tokenizer
  * (BpeOps.q_bpe_bytes): any string decomposes into these 256 symbols,
  * which is what makes the fallback encoding TOTAL (zero OOV by
  * construction), including for characters the trainer never saw and
  * for astral code points (one code point → up to 4 byte symbols).
  *
  * Reads the UTF8String's backing bytes directly — no charset encode,
  * no copy beyond the output array. Static-kernel codegen keeps the
  * surrounding stage whole-stage-compiled (the SimHash64 pattern).
  */
case class Utf8Bytes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "utf8_bytes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"utf8_bytes requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Utf8Bytes.bytesOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Utf8Bytes.bytesOf($c);")

  override protected def withNewChildInternal(newChild: Expression): Utf8Bytes =
    copy(child = newChild)
}

object Utf8Bytes {
  /** The kernel — static so generated code can call it directly. */
  def bytesOf(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val out = new Array[Int](b.length)
    var i = 0
    while (i < b.length) {
      out(i) = b(i) & 0xff
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def utf8_bytes(c: Column): Column =
    ColumnBridge.column(Utf8Bytes(ColumnBridge.expression(c)))
}
