package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Coarse-quantizer assignment for IVF ANN: index of the squared-L2
  * nearest centroid for a float vector. The codebook (k × dim doubles —
  * kilobytes) rides along as an expression parameter, bound into the
  * generated code as a reference object, so assignment runs over Tungsten
  * rows directly: no Dataset deserialization of the corpus, no
  * interpreted lambda — the whole IVF build stage stays inside
  * whole-stage codegen. Distance ties break toward the LOWER index,
  * matching [[graft.operators.SimilarityOps.nearestCentroid]] (the
  * driver-side trainer), which CustomFunctionsSpec asserts for parity.
  */
case class NearestCentroid(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires array<float>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    NearestCentroid.nearest(cents, v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NearestCentroid.nearest($ref, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  /** The kernel — static so generated code can call it directly. Null
    * elements contribute distance against 0.0 - fixture vectors carry no
    * nulls; the choice only needs to be deterministic. */
  def nearest(cents: Array[Array[Double]], v: ArrayData): Int = {
    val n = v.numElements()
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val dim = math.min(n, cent.length)
      var d = 0.0
      var i = 0
      while (i < dim) {
        val x = if (v.isNullAt(i)) 0.0 else v.getFloat(i).toDouble
        val t = x - cent(i)
        d += t * t
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Column-API entry point. */
  def nearest_centroid(v: Column, cents: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(v), cents))
}
