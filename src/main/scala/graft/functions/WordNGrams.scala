package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct ordered word n-gram shingles of a token array, in one pass.
  *
  * Semantically identical to
  * `array_distinct(transform(sequence(1, size-n+1), i -> concat_ws(" ",
  * element_at(t,i), ...)))`, but ~10× faster: Spark's higher-order
  * functions evaluate their lambdas INTERPRETED (one boxed expression-tree
  * walk per element), which made shingling dominate the dedup pipeline.
  * This expression is one virtual call per row wrapping a tight loop over
  * `UTF8String`s — the row-at-a-time cost every shingling-heavy operator
  * (n-gram dedup, MinHash) sits on.
  */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordNGrams.ngrams(input.asInstanceOf[ArrayData], this.n)

  /** Generated code calls the static kernel, keeping the surrounding
    * operators inside whole-stage codegen. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNGrams.ngrams($c, ${this.n});")

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object WordNGrams {
  private val sep = UTF8String.fromString(" ")

  /** Gram assembly shared by the distinct and positional kernels: the
    * n-gram starting at token i, with the null→empty substitution —
    * kept in ONE place so the two kernels can never diverge on
    * null/empty handling. */
  private def gramAt(arr: ArrayData, i: Int, n: Int,
      parts: Array[UTF8String]): UTF8String = {
    var k = 0
    while (k < n) {
      val e = arr.getUTF8String(i + k)
      parts(k) = if (e == null) UTF8String.EMPTY_UTF8 else e
      k += 1
    }
    UTF8String.concatWs(sep, parts: _*)
  }

  /** The kernel — static so generated code can call it directly. */
  def ngrams(arr: ArrayData, n: Int): GenericArrayData = {
    val total = arr.numElements() - n + 1
    if (total <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](total * 2)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < total) {
      seen.add(gramAt(arr, i, n, parts))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** Positional sibling of [[ngrams]]: ALL n-grams in token order with
    * multiplicity preserved, so element k is the gram starting at token k
    * (`posexplode` recovers (start-position, gram) exactly). Span-level
    * operators (duplicated-span removal) need the position ↦ gram map that
    * the distinct-set kernel deliberately destroys. */
  def ngramsSeq(arr: ArrayData, n: Int): GenericArrayData = {
    val total = arr.numElements() - n + 1
    if (total <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[AnyRef](total)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < total) {
      out(i) = gramAt(arr, i, n, parts)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point: distinct ordered n-grams of a token array. */
  def word_ngrams(c: Column, n: Int): Column =
    ColumnBridge.column(WordNGrams(ColumnBridge.expression(c), n))

  /** Column-API entry point: positional n-grams (all, in order). */
  def word_ngrams_seq(c: Column, n: Int): Column =
    ColumnBridge.column(WordNGramsSeq(ColumnBridge.expression(c), n))
}

/** ALL ordered word n-grams with multiplicity, element k = gram starting
  * at token k — see [[WordNGrams.ngramsSeq]]. Same codegen shape as the
  * distinct kernel: one static call, surrounding operators stay fused. */
case class WordNGramsSeq(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams_seq"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams_seq requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordNGrams.ngramsSeq(input.asInstanceOf[ArrayData], this.n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNGrams.ngramsSeq($c, ${this.n});")

  override protected def withNewChildInternal(newChild: Expression): WordNGramsSeq =
    copy(child = newChild)
}
