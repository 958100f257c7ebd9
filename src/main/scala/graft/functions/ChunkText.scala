package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All context-window chunks of a document in ONE pass over its text:
  * `array<struct<chunk_idx, start_tok, end_tok, chunk_text>>` for
  * `len`-token windows at stride `len - overlap`, short tail-preserving
  * final window, tokens = non-empty pieces of `split(lower(text), ' +')`
  * joined back with single spaces.
  *
  * Why an expression and not a declarative chain (the round-9
  * QualityModelScore lesson, which this repeats for a GENERATOR-shaped
  * op): producing chunk TEXT declaratively either (a) carries the token
  * array through the explode — the Generate then copies the whole array
  * into every chunk row, O(n²/stride) bytes per document, a quadratic
  * wall for book-length docs — or (b) slices inside a `transform` lambda,
  * where CollapseProject inlines the tokenization into every slice
  * reference and HOF lambdas evaluate interpreted per element. This
  * kernel tokenizes once, emits exactly the output bytes (each token
  * lands in ≤ ceil(len/stride) chunks), and keeps the surrounding
  * operators inside whole-stage codegen. The caller explodes the result.
  */
case class ChunkText(child: Expression, len: Int, overlap: Int)
    extends UnaryExpression {

  require(len > 0 && overlap >= 0 && overlap < len,
    s"need 0 <= overlap < len, got len=$len overlap=$overlap")

  override def dataType: DataType = ChunkText.schema
  override def prettyName: String = "chunk_text"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"chunk_text requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    ChunkText.chunks(input.asInstanceOf[UTF8String], len, overlap)

  /** Generated code calls the static kernel, keeping the surrounding
    * operators inside whole-stage codegen. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ChunkText.chunks($c, ${this.len}, ${this.overlap});")

  override protected def withNewChildInternal(newChild: Expression): ChunkText =
    copy(child = newChild)
}

object ChunkText {
  val structType: StructType = StructType(Seq(
    StructField("chunk_idx", LongType, nullable = false),
    StructField("start_tok", LongType, nullable = false),
    StructField("end_tok", LongType, nullable = false),
    StructField("chunk_text", StringType, nullable = false)))
  val schema: DataType = ArrayType(structType, containsNull = false)

  /** The one-pass kernel. Tokenization matches
    * `filter(split(lower(text), " +"), x -> x <> "")` (and DuckDB's
    * `list_filter(regexp_split_to_array(lower(text), ' +'), ...)`):
    * lower-casing via UTF8String (Spark's own `lower`), Java-regex
    * split, empties dropped. A token-less document chunks to an EMPTY
    * array, which `explode` then drops — the `n_tok > 0` filter. */
  def chunks(text: UTF8String, len: Int, overlap: Int): ArrayData = {
    val toks = text.toLowerCase.toString.split(" +", -1).filter(_.nonEmpty)
    val n = toks.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val stride = len - overlap
    val nc = if (n <= len) 1 else 1 + ((n - len + stride - 1) / stride)
    val out = new Array[Any](nc)
    var i = 0
    while (i < nc) {
      val start = i * stride
      val end = math.min(start + len, n)
      val sb = new java.lang.StringBuilder
      var j = start
      while (j < end) {
        if (j > start) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(i) = InternalRow(i.toLong, start.toLong, end.toLong,
        UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(out)
  }

  def chunk_text(c: Column, len: Int, overlap: Int): Column =
    ColumnBridge.column(ChunkText(ColumnBridge.expression(c), len, overlap))
}
