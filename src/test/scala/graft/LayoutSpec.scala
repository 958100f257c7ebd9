package graft

import org.apache.spark.sql.functions._
import graft.functions.ZOrderKey

/** Z-order layout: kernel arithmetic, bucket bounding-box invariant, and
  * the actual pruning effect on written files. */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("interleave kernel: known values and bit structure") {
    // x=5 (101), y=3 (011), 3 bits:
    // x bits at even positions: 1,0,1 -> 1 + 16; y at odd: 1,1,0 -> 2 + 8
    assert(ZOrderKey.interleave(5L, 3L, 3) === 27L)
    assert(ZOrderKey.interleave(0L, 0L, 10) === 0L)
    // single-bit checks: x bit i lands at 2i, y bit i at 2i+1
    assert(ZOrderKey.interleave(1L << 4, 0L, 10) === (1L << 8))
    assert(ZOrderKey.interleave(0L, 1L << 4, 10) === (1L << 9))
    // only the low `bits` bits participate
    assert(ZOrderKey.interleave(1L << 10, 0L, 10) === 0L)
  }

  test("every z-order bucket is a tight box in BOTH dimensions") {
    val rows = q("q_layout_zorder")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (bucket, n, minPx, maxPx, minSy, maxSy) =>
      assert(n > 0)
      assert(maxPx - minPx <= 63L, s"bucket $bucket px spread")
      assert(maxSy - minSy <= 63L, s"bucket $bucket sy spread")
      // the bucket id IS the interleaved top bits of the box corner
      assert(ZOrderKey.interleave(minPx >> 6, minSy >> 6, 4) === bucket)
    }
  }

  test("z-ordered files prune a two-sided box predicate better than a " +
      "single-column sort") {
    val keyed = Tables.lineitem(spark, sf)
      .select(pmod($"l_partkey", lit(1024L)).as("px"),
        pmod($"l_orderkey", lit(1024L)).as("sy"))
      .withColumn("zkey", ZOrderKey.zorder_key($"px", $"sy", 10))
    val base = java.nio.file.Files
      .createTempDirectory("graft_zorder").toString
    val nFiles = 16
    keyed.repartitionByRange(nFiles, $"zkey")
      .sortWithinPartitions($"zkey")
      .write.mode("overwrite").parquet(s"$base/zorder")
    keyed.repartitionByRange(nFiles, $"px")
      .sortWithinPartitions($"px")
      .write.mode("overwrite").parquet(s"$base/bypx")

    // per-file bounding boxes = exactly what parquet footer min/max
    // stats expose to the reader; a file is "touched" by the box
    // predicate iff its bounds overlap the box
    def touched(dir: String, loPx: Long, loSy: Long, w: Long): Int = {
      val files = spark.read.parquet(dir).inputFiles
      files.count { f =>
        val st = spark.read.parquet(f)
          .agg(min($"px"), max($"px"), min($"sy"), max($"sy")).head()
        val (a, b, c, dd) =
          (st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3))
        b >= loPx && a <= loPx + w && dd >= loSy && c <= loSy + w
      }
    }
    // average over a few 64-wide boxes spread across the space
    val boxes = Seq((64L, 64L), (256L, 512L), (512L, 128L), (768L, 768L))
    val (zTouched, pTouched) = boxes.map { case (lx, ly) =>
      (touched(s"$base/zorder", lx, ly, 63L),
        touched(s"$base/bypx", lx, ly, 63L))
    }.reduce((x, y) => (x._1 + y._1, x._2 + y._2))
    // the px-sorted layout localizes px but stripes sy across every
    // file, so the sy half of the box prunes ~nothing; z-order bounds
    // both dims per file
    assert(zTouched < pTouched,
      s"zorder touched $zTouched files vs px-sort $pTouched")
  }
}
