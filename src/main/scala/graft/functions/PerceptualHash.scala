package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Perceptual difference-hash (dHash, Krawetz 2013) of a BMP payload:
  * grayscale the image down to a 9×8 grid by nearest-neighbor sampling,
  * emit one bit per horizontally-adjacent cell pair (right > left), 64
  * bits total. Identical pixels hash identically; a uniform brightness
  * shift (every byte +c, no wrap) preserves every adjacent-cell
  * comparison and therefore the hash EXACTLY — the invariance the
  * multimodal near-dup operator (MultimodalOps.q_dedup_media) banks on.
  *
  * All math is integer (byte sums, floor-divided grid coordinates, strict
  * > comparisons), so a DuckDB oracle can replay the hash bit-for-bit
  * from the fixture generator formulas. Non-BMP / truncated / top-down /
  * non-24bpp payloads return NULL, not task failures (the MediaCodec
  * corrupt-row posture).
  *
  * Custom Catalyst `Expression` with a static kernel call in codegen —
  * the surrounding stage stays whole-stage-compiled (same pattern as
  * SimHash64 / DecodeMediaHeader).
  */
case class DHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dhash64 requires binary, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    PerceptualHash.dhash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val t = ctx.freshName("ph")
      s"""
      java.lang.Long $t = graft.functions.PerceptualHash.dhash($c);
      ${ev.isNull} = $t == null;
      ${ev.value} = ${ev.isNull} ? -1L : $t.longValue();
      """
    })

  override protected def withNewChildInternal(newChild: Expression): DHash64 =
    copy(child = newChild)
}

/** The raw pixel byte stream of a BMP payload — header and per-row
  * padding stripped, rows in storage order (bottom-up as stored). Two
  * payloads are pixel-identical iff their `bmp_pixels` are byte-equal,
  * which is the EXACT verify the perceptual candidates go through (a
  * content-bloom / byte-hash dedup would miss a re-encoded image whose
  * padding bytes differ; this does not). NULL for non-BMP payloads.
  */
case class BmpPixels(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "bmp_pixels"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bmp_pixels requires binary, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    PerceptualHash.pixels(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.PerceptualHash.pixels($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): BmpPixels =
    copy(child = newChild)
}

object PerceptualHash {

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** (width, height, dataOffset, rowSize) of a well-formed bottom-up
    * 24bpp BMP whose full pixel region is in bounds, else null.
    * `private[graft]`: the multimodal fixture builders use it to plant
    * geometry-aware perturbations (MultimodalOps.halfBright). */
  private[graft] def bmpGeometry(b: Array[Byte]): Array[Int] = {
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M') return null
    val dataOffset = le32(b, 10).toInt
    val dibSize = le32(b, 14)
    val width = le32(b, 18).toInt
    val height = le32(b, 22).toInt
    val planes = le16(b, 26)
    val bpp = le16(b, 28)
    if (dibSize < 40 || dataOffset < 54 || planes != 1 || bpp != 24 ||
      width <= 0 || height <= 0) return null
    val rowSize = ((width * 3 + 3) / 4) * 4
    if (dataOffset.toLong + rowSize.toLong * height > b.length) return null
    Array(width, height, dataOffset, rowSize)
  }

  /** The dHash kernel — static so generated code can call it directly.
    * Grid point (gx, gy), gx ∈ [0,9), gy ∈ [0,8): pixel at
    * (gx*w/9, gy*h/8) (floor, top-down y); gray = B+G+R byte sum (no
    * division — exact). Bit k = gy*8+gx set iff gray(gx+1,gy) >
    * gray(gx,gy). */
  def dhash(b: Array[Byte]): java.lang.Long = {
    val g = bmpGeometry(b)
    if (g == null) return null
    val w = g(0); val h = g(1); val off = g(2); val rs = g(3)
    val gray = new Array[Int](72)
    var gy = 0
    while (gy < 8) {
      val py = gy * h / 8
      val rowOff = off + (h - 1 - py) * rs // rows stored bottom-up
      var gx = 0
      while (gx < 9) {
        val o = rowOff + (gx * w / 9) * 3
        gray(gy * 9 + gx) =
          (b(o) & 0xff) + (b(o + 1) & 0xff) + (b(o + 2) & 0xff)
        gx += 1
      }
      gy += 1
    }
    var out = 0L
    var k = 0
    while (k < 64) {
      val row = k >> 3
      val col = k & 7
      if (gray(row * 9 + col + 1) > gray(row * 9 + col)) out |= 1L << k
      k += 1
    }
    java.lang.Long.valueOf(out)
  }

  /** The pixel-extraction kernel: w*3 bytes per row × h rows, padding
    * dropped, storage (bottom-up) row order. */
  def pixels(b: Array[Byte]): Array[Byte] = {
    val g = bmpGeometry(b)
    if (g == null) return null
    val w = g(0); val h = g(1); val off = g(2); val rs = g(3)
    val out = new Array[Byte](w * 3 * h)
    var r = 0
    while (r < h) {
      System.arraycopy(b, off + r * rs, out, r * w * 3, w * 3)
      r += 1
    }
    out
  }

  /** Column-API entry points. */
  def dhash64(c: Column): Column =
    ColumnBridge.column(DHash64(ColumnBridge.expression(c)))
  def bmp_pixels(c: Column): Column =
    ColumnBridge.column(BmpPixels(ColumnBridge.expression(c)))
}
