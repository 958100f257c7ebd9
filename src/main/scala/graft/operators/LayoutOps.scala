package graft.operators

import org.apache.spark.sql.functions._
import graft.{QueryDef, QueryPack, Tables}

/** Data-layout tier: multi-dimensional clustering for scan pruning.
  *
  * A 100 TB fact table is written once and filtered forever — by MORE
  * than one dimension. A single-column sort gives parquet row-group
  * min/max pruning on that column and nothing else; the Z-order curve
  * ([[graft.functions.ZOrderKey]]) makes one sort key localize two
  * dimensions at once, so every written file covers a small (x, y)
  * bounding box and a two-sided predicate prunes files/row-groups on
  * both columns. This is the OPTIMIZE ZORDER technique of the lakehouse
  * engines expressed as a plain deterministic expression + ordinary
  * `repartitionByRange` writer, no table format required. LayoutSpec
  * proves the pruning effect on written files; the declared query pins
  * the curve arithmetic and the bounding-box tightness cross-engine.
  */
object LayoutOps extends QueryPack {

  /** 10 bits/dim → 20-bit key; bucket = top 8 interleaved bits, i.e. a
    * 64×64 box in (px, sy) space. */
  private[graft] val ZBits = 10
  private val BucketShift = 12

  private val layoutZorder = QueryDef(
    "q_layout_zorder",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .select(pmod($"l_partkey", lit(1024L)).as("px"),
          pmod($"l_orderkey", lit(1024L)).as("sy"))
        .withColumn("zkey",
          graft.functions.ZOrderKey.zorder_key($"px", $"sy", ZBits))
        .groupBy(shiftright($"zkey", BucketShift).as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min($"px").as("min_px"), max($"px").as("max_px"),
          min($"sy").as("min_sy"), max($"sy").as("max_sy"))
        .orderBy($"bucket")
    },
    Some(s"""WITH k AS (
        SELECT l_partkey % 1024 AS px, l_orderkey % 1024 AS sy FROM lineitem),
      z AS (
        SELECT px, sy,
          CAST(list_sum(list_transform(range(0, $ZBits),
            i -> ((px >> i) & 1) * (1 << (2*i))
               + ((sy >> i) & 1) * (1 << (2*i + 1)))) AS BIGINT) AS zkey
        FROM k)
      SELECT zkey >> $BucketShift AS bucket, CAST(count(*) AS BIGINT) AS n_rows,
        CAST(min(px) AS BIGINT) AS min_px, CAST(max(px) AS BIGINT) AS max_px,
        CAST(min(sy) AS BIGINT) AS min_sy, CAST(max(sy) AS BIGINT) AS max_sy
      FROM z GROUP BY 1 ORDER BY bucket"""),
    "Z-order curve bucketing: every bucket is a 64x64 bounding box in " +
      "BOTH dimensions (the multi-dim layout-pruning invariant)")

  override def defs: Seq[QueryDef] = Seq(layoutZorder)
}
