package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass hashed-ngram quality scorer: (n_grams, raw milli-score) of a
  * token array under the fixed public weight formula
  *
  *   bucket(g) = int(first 8 hex digits of md5(g)) mod 2^16
  *   w(g)      = (bucket(g) · 2654435761) mod 2001 − 1000
  *
  * summed over word unigrams + bigrams (empty tokens skipped). The
  * declarative formulation — filter → arrays_zip slices → aggregate()
  * with md5/conv inside the lambda — is semantically identical but walks
  * interpreted boxed expression trees per gram; at the 10× stress scale
  * that made the model gate the q_pipeline_clean bottleneck (~13 s of a
  * 16 s query). This kernel is one virtual call per row wrapping a tight
  * digest loop, and `doGenCode` keeps the surrounding projection/filter
  * inside whole-stage codegen. The DuckDB oracle recomputes the identical
  * integers from the md5 hex — see TextOps.modelSqlRaw.
  */
case class QualityModelScore(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("raw", LongType, nullable = false)))
  override def prettyName: String = "quality_model_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quality_model_score requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    QualityModelScore.score(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QualityModelScore.score($c);")

  override protected def withNewChildInternal(newChild: Expression): QualityModelScore =
    copy(child = newChild)
}

object QualityModelScore {
  val Buckets = 65536L
  val Knuth = 2654435761L
  val Mod = 2001L

  private val sep = UTF8String.fromString(" ")
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** w(g): first 4 md5 bytes big-endian as unsigned == parsing the first
    * 8 hex digits, exactly the conv(substr(md5(g),1,8),16,10) the oracle
    * replays. All intermediates fit a long (65535 · 2654435761 ≈ 1.7e14). */
  private def weightOf(digest: java.security.MessageDigest,
      bytes: Array[Byte]): Long = {
    digest.reset()
    val d = digest.digest(bytes)
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (v % Buckets) * Knuth % Mod - 1000L
  }

  /** The kernel — static so generated code can call it directly. Skips
    * empty/null tokens (the oracle's list_filter(x <> '')), then scores
    * the m unigrams and m-1 bigrams of the compacted token list. */
  def score(arr: ArrayData): InternalRow = {
    val n0 = arr.numElements()
    val toks = new Array[UTF8String](n0)
    var m = 0
    var i = 0
    while (i < n0) {
      val e = arr.getUTF8String(i)
      if (e != null && e.numBytes() > 0) { toks(m) = e; m += 1 }
      i += 1
    }
    val digest = md.get()
    var raw = 0L
    i = 0
    while (i < m) {
      raw += weightOf(digest, toks(i).getBytes)
      i += 1
    }
    i = 0
    while (i < m - 1) {
      raw += weightOf(digest,
        UTF8String.concatWs(sep, toks(i), toks(i + 1)).getBytes)
      i += 1
    }
    val nGrams = if (m >= 2) m.toLong * 2 - 1 else m.toLong
    new GenericInternalRow(Array[Any](nGrams, raw))
  }

  def quality_model_score(c: Column): Column =
    ColumnBridge.column(QualityModelScore(ColumnBridge.expression(c)))
}
