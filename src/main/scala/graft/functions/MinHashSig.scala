package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** k-permutation MinHash signature of a string set, in one pass.
  *
  * h_i(s) = XXH64(bytes(s), seed = i); the signature is the element-wise
  * minimum over the set. Semantically equivalent to the declarative
  * `transform(sequence(0, k-1), i -> array_min(transform(sh, s ->
  * xxhash64-style(s, i))))`, but that chain evaluates its lambdas
  * INTERPRETED (k × |sh| boxed expression walks per row) and dominated
  * the MinHash pipeline; this is one tight loop per row (same shape as
  * [[WordNGrams]]). The hash family only needs to be fixed and uniform —
  * LSH recall is spec-verified against the exact Jaccard pairs.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1 && k <= 1024, s"signature size must be in [1,1024], got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.sig(input.asInstanceOf[ArrayData], this.k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.sig($c, ${this.k});")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  /** The kernel — static so generated code can call it directly. */
  def sig(arr: ArrayData, k: Int): GenericArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val base = s.getBaseObject
        val off = s.getBaseOffset
        val len = s.numBytes
        var j = 0
        while (j < k) {
          val h = XXH64.hashUnsafeBytes(base, off, len, j.toLong)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(Long.box).asInstanceOf[Array[AnyRef]])
  }

  /** Column-API entry point. */
  def minhash_sig(c: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(c), k))
}
