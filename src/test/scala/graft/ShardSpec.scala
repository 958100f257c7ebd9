package graft

import org.apache.spark.sql.functions._
import graft.operators.ShardOps

/** q_shard_write contract (VERDICT r11 task 1): every packed row is
  * exactly ShardOps.SeqLen ids except each shard's tail; the layout on
  * disk is hive-partitioned by shard; nothing is lost or invented
  * relative to the subword-id stream it packs. */
class ShardSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val rows = q("q_shard_write").collect()

  test("every packed row is exactly SeqLen ids except per-shard tails") {
    val byShard = rows.groupBy(_.getAs[Long]("shard"))
    assert(byShard.nonEmpty)
    byShard.foreach { case (shard, rs) =>
      val maxSeq = rs.map(_.getAs[Long]("seq_idx")).max
      rs.foreach { r =>
        val (seq, n) = (r.getAs[Long]("seq_idx"), r.getAs[Long]("n_ids"))
        if (seq < maxSeq)
          assert(n === ShardOps.SeqLen.toLong,
            s"shard $shard seq $seq is not a full row ($n ids)")
        else
          assert(n >= 1L && n <= ShardOps.SeqLen.toLong,
            s"shard $shard tail row has $n ids")
      }
      // seq indexes are dense from 0 — a data loader can address rows
      // by (shard, seq_idx) without a manifest lookup
      assert(rs.map(_.getAs[Long]("seq_idx")).sorted.toSeq ===
        (0L to maxSeq).toSeq, s"shard $shard seq_idx not dense")
    }
  }

  test("ids_str carries exactly n_ids entries and conserves the token stream") {
    rows.foreach { r =>
      val n = r.getAs[Long]("n_ids")
      assert(r.getAs[String]("ids_str").split(",", -1).length.toLong === n)
    }
    // conservation: Σ n_ids over all packed rows == |subword-id stream|
    val total = operators.BpeOps.subwordIdRows(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_ids")).sum === total)
  }

  test("the write lands hive-partitioned by shard and prunes on read") {
    val dir = operators.ShardOps.shardDir(sf)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(parts.length === ShardOps.NShards,
      s"expected ${ShardOps.NShards} shard dirs, got ${parts.mkString(",")}")
    // a single-shard read plans a partition filter, not a full scan
    val one = spark.read.parquet(dir).filter($"shard" === 3)
    val scan = one.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("shard"),
      s"single-shard read should partition-prune:\n$scan")
  }
}
