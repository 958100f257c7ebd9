package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Multi-band signed-random-projection (SRP) LSH signature of a float
  * vector: `bands` longs, each packing `bits` sign bits — bit j of band b
  * is set iff dot(v, plane_{b*bits+j}) > 0. Hyperplanes are pseudorandom
  * gaussians from a fixed seed (generated once per (seed, planes, dim)
  * and cached), so the signature is deterministic across executors.
  *
  * Semantically equal to the declarative chain of `bands × bits`
  * `aggregate(zip_with(v, plane, *), 0, +)` dot products, but those HOF
  * lambdas evaluate INTERPRETED (boxed expression walks per element);
  * this is one tight loop per row callable from generated code — the same
  * shape (and measured win) as [[MinHashSig]] / [[DecimalDot]].
  *
  * `bands = 1, bits = 8` reproduces the engine's original single-band
  * 8-bit ANN signature (same seed ⇒ same plane stream ⇒ same buckets);
  * multi-band OR-ed buckets are the near-dup audit's scale path — pair
  * work is bounded by band-bucket population (~N/2^bits per bucket), not
  * bucket count.
  */
case class SrpSig(child: Expression, bands: Int, bits: Int, seed: Long)
    extends UnaryExpression {

  require(bands >= 1 && bands <= 64, s"bands must be in [1,64], got $bands")
  require(bits >= 1 && bits <= 63, s"bits per band must be in [1,63], got $bits")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_sig requires array<float>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SrpSig.sig(input.asInstanceOf[ArrayData], this.bands, this.bits, this.seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SrpSig.sig($c, ${this.bands}, ${this.bits}, ${this.seed}L);")

  override protected def withNewChildInternal(newChild: Expression): SrpSig =
    copy(child = newChild)
}

object SrpSig {

  /** Hyperplane cache: one gaussian matrix per (seed, nPlanes, dim).
    * Plane k's components are the k-th block of `dim` draws from a single
    * seeded gaussian stream — the same layout the original declarative
    * formulation used, so seed 20240101 with 8 planes reproduces it. */
  private val planeCache =
    new ConcurrentHashMap[(Long, Int, Int), Array[Array[Double]]]()

  private[graft] def planes(seed: Long, nPlanes: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((seed, nPlanes, dim), { key =>
      val rnd = new scala.util.Random(key._1)
      Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
    })

  /** The kernel — static so generated code can call it directly. */
  def sig(v: ArrayData, bands: Int, bits: Int, seed: Long): GenericArrayData = {
    val dim = v.numElements()
    val ps = planes(seed, bands * bits, dim)
    val out = new Array[Long](bands)
    var k = 0
    while (k < bands * bits) {
      val p = ps(k)
      var dot = 0.0
      var i = 0
      while (i < dim) {
        if (!v.isNullAt(i)) dot += v.getFloat(i).toDouble * p(i)
        i += 1
      }
      if (dot > 0) out(k / bits) |= 1L << (k % bits)
      k += 1
    }
    new GenericArrayData(out.map(Long.box).asInstanceOf[Array[AnyRef]])
  }

  /** Column-API entry point. */
  def srp_sig(c: Column, bands: Int, bits: Int, seed: Long): Column =
    ColumnBridge.column(SrpSig(ColumnBridge.expression(c), bands, bits, seed))
}
