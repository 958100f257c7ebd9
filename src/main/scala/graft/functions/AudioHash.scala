package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Temporal fingerprint of a PCM WAV payload — the audio analog of
  * [[PerceptualHash]]'s dHash: sample the interleaved 16-bit stream at
  * 65 nearest-neighbor probe points, emit one bit per adjacent probe
  * pair (later > earlier), 64 bits total. Identical sample streams hash
  * identically; a uniform DC offset (every sample +c, no clip)
  * preserves every adjacent comparison and therefore the hash EXACTLY —
  * the invariance the audio near-dup operator
  * (MultimodalOps.q_dedup_audio) banks on, and one a byte-hash dedup
  * structurally misses.
  *
  * All math is integer (LE 16-bit reads, floor-divided probe indices,
  * strict > comparisons), so a DuckDB oracle replays the hash
  * bit-for-bit from the fixture generator formulas. Non-WAV / truncated
  * / non-16-bit payloads return NULL, not task failures (the MediaCodec
  * corrupt-row posture).
  *
  * Custom Catalyst `Expression`s with static kernel calls in codegen —
  * the surrounding stage stays whole-stage-compiled (the DHash64 /
  * SimHash64 pattern).
  */
case class AudioHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "audiohash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"audiohash64 requires binary, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    AudioHash.ahash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val t = ctx.freshName("ah")
      s"""
      java.lang.Long $t = graft.functions.AudioHash.ahash($c);
      ${ev.isNull} = $t == null;
      ${ev.value} = ${ev.isNull} ? -1L : $t.longValue();
      """
    })

  override protected def withNewChildInternal(newChild: Expression): AudioHash64 =
    copy(child = newChild)
}

/** The raw PCM data-chunk bytes of a WAV payload — RIFF framing and any
  * junk chunks stripped. Two payloads are sample-identical iff their
  * `wav_samples` are byte-equal: the EXACT verify the fingerprint
  * candidates go through (and what a container-level byte hash misses
  * when only chunk layout differs). NULL for non-WAV payloads.
  */
case class WavSamples(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "wav_samples"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wav_samples requires binary, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    AudioHash.samples(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.AudioHash.samples($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): WavSamples =
    copy(child = newChild)
}

object AudioHash {

  /** (dataOffset, dataBytes) of a well-formed 16-bit PCM WAV whose data
    * chunk is fully in bounds and holds ≥ 2 samples, else null. Reuses
    * MediaCodec's shared [[MediaCodec.riffWalk]] (one chunk walk for the
    * header-decode and hash paths — bounds/termination hardening lives
    * in exactly one place), additionally requiring bits == 16 so the
    * sample reads are defined. `private[graft]`: the multimodal fixture
    * builders use it to plant sample-level perturbations
    * (MultimodalOps.dcShift). */
  private[graft] def wavData(b: Array[Byte]): Array[Int] = {
    if (b == null || b.length < 44 ||
      !MediaCodec.hasTag(b, 0, "RIFF") || !MediaCodec.hasTag(b, 8, "WAVE"))
      return null
    var bits = -1L
    var dataOff = -1; var dataLen = -1L
    MediaCodec.riffWalk(b) { off =>
      val size = MediaCodec.le32(b, off + 4)
      if (MediaCodec.hasTag(b, off, "fmt ") && size >= 16 &&
          off + 8 + 16 <= b.length)
        bits = MediaCodec.le16(b, off + 22).toLong
      else if (MediaCodec.hasTag(b, off, "data")) {
        dataOff = off + 8; dataLen = size
      }
    }
    if (bits != 16 || dataOff < 0 || dataLen < 4 ||
      dataOff.toLong + dataLen > b.length) return null
    Array(dataOff, dataLen.toInt)
  }

  /** The fingerprint kernel — static so generated code can call it
    * directly. n = dataBytes/2 interleaved 16-bit samples; probe point
    * k ∈ [0, 65) reads sample idx = k*n/65 (floor; signed LE). Bit k
    * set iff probe(k+1) > probe(k). */
  def ahash(b: Array[Byte]): java.lang.Long = {
    val g = wavData(b)
    if (g == null) return null
    val off = g(0); val n = g(1) / 2
    val probe = new Array[Int](65)
    var k = 0
    while (k < 65) {
      val idx = (k.toLong * n / 65).toInt
      probe(k) = MediaCodec.le16(b, off + idx * 2).toShort.toInt // signed LE16
      k += 1
    }
    var out = 0L
    k = 0
    while (k < 64) {
      if (probe(k + 1) > probe(k)) out |= 1L << k
      k += 1
    }
    java.lang.Long.valueOf(out)
  }

  /** The sample-extraction kernel: the data chunk bytes, container
    * framing stripped. */
  def samples(b: Array[Byte]): Array[Byte] = {
    val g = wavData(b)
    if (g == null) return null
    java.util.Arrays.copyOfRange(b, g(0), g(0) + g(1))
  }

  /** Column-API entry points. */
  def audiohash64(c: Column): Column =
    ColumnBridge.column(AudioHash64(ColumnBridge.expression(c)))
  def wav_samples(c: Column): Column =
    ColumnBridge.column(WavSamples(ColumnBridge.expression(c)))
}
