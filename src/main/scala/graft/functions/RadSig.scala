package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Multi-band Rademacher-SRP LSH signature of a SCALE-6 SCALED vector
  * (the [[DecimalScale6]] representation): `bands` longs, each packing
  * `bits` sign bits — bit j of band b is set iff
  * Σ_i s(b·bits+j, i) · sv[i] > 0, where the hyperplane component
  * s(k, i) ∈ {+1, −1} is the top bit of splitmix64(seed + k·dim + i).
  *
  * Two deliberate departures from [[SrpSig]] (the gaussian family used
  * by q_simsearch_ann_srp), both in service of CROSS-ENGINE REPLAY:
  *
  *  - ±1 (Rademacher) hyperplanes instead of gaussians. For sign-random-
  *    projection the component distribution only needs symmetry
  *    (Achlioptas' database-friendly projections, PODS '01); ±1 planes
  *    make the per-plane dot an exact INTEGER sum of the scale-6
  *    elements, so the sign — hence every band key, hence the entire
  *    persisted index artifact — is bit-identical in any engine that can
  *    fix floats at scale 6. Gaussians from a JVM PRNG are replayable by
  *    nobody else, which is exactly why the SrpSig queries are
  *    audit-covered instead of oracle-checked.
  *  - splitmix64 (Steele/Lea/Flood, public SplittableRandom finalizer)
  *    instead of a seeded Random STREAM: each component is a pure
  *    function of (seed, k, i), so the DuckDB oracle derives the same
  *    plane matrix from four arithmetic CTEs — no stateful generator to
  *    imitate, no plane cache to ship.
  *
  * Input is the scaled-long form, not the raw float vector, so the
  * signature provably shares one conversion convention with the
  * [[ScaledDot]] rerank scorer (null elements are the same
  * [[ScaledDot.NullSentinel]], skipped here as there). Overflow-safe by
  * construction: |sv[i]| < 2^62 is enforced by decimal_scale6, and the
  * fixture/embedding domain keeps |sv[i]| ≤ 9·10^12, so a 64-dim ±sum
  * stays far inside a long.
  */
case class RadSig(child: Expression, bands: Int, bits: Int, seed: Long)
    extends UnaryExpression {

  require(bands >= 1 && bands <= 64, s"bands must be in [1,64], got $bands")
  require(bits >= 1 && bits <= 63, s"bits per band must be in [1,63], got $bits")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rad_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rad_sig requires array<long> (decimal_scale6 form), got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    RadSig.sig(input.asInstanceOf[ArrayData], this.bands, this.bits, this.seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RadSig.sig($c, ${this.bands}, ${this.bits}, ${this.seed}L);")

  override protected def withNewChildInternal(newChild: Expression): RadSig =
    copy(child = newChild)
}

object RadSig {

  /** splitmix64 finalizer — the (seed, k, i) → sign mix. Wrapping Long
    * arithmetic IS the mod-2^64 the DuckDB oracle spells out in HUGEINT. */
  private[graft] def mix64(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Sign matrix cache: one ±1 table per (seed, nPlanes, dim) — true
    * means +1 (top bit of the mix set; as a signed long, negative). */
  private val signCache =
    new ConcurrentHashMap[(Long, Int, Int), Array[Array[Boolean]]]()

  private[graft] def signs(seed: Long, nPlanes: Int, dim: Int): Array[Array[Boolean]] =
    signCache.computeIfAbsent((seed, nPlanes, dim), { key =>
      Array.tabulate(key._2, key._3)((k, i) =>
        mix64(key._1 + k.toLong * key._3 + i) < 0L)
    })

  /** The kernel — static so generated code can call it directly. */
  def sig(sv: ArrayData, bands: Int, bits: Int, seed: Long): GenericArrayData = {
    val dim = sv.numElements()
    val ss = signs(seed, bands * bits, dim)
    val out = new Array[Long](bands)
    var k = 0
    while (k < bands * bits) {
      val s = ss(k)
      var acc = 0L
      var i = 0
      while (i < dim) {
        val e = if (sv.isNullAt(i)) ScaledDot.NullSentinel else sv.getLong(i)
        if (e != ScaledDot.NullSentinel) acc += (if (s(i)) e else -e)
        i += 1
      }
      if (acc > 0) out(k / bits) |= 1L << (k % bits)
      k += 1
    }
    new GenericArrayData(out.map(Long.box).asInstanceOf[Array[AnyRef]])
  }

  /** Column-API entry point. */
  def rad_sig(c: Column, bands: Int, bits: Int, seed: Long): Column =
    ColumnBridge.column(RadSig(ColumnBridge.expression(c), bands, bits, seed))
}
