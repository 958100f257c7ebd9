package graft

import graft.operators.ShardOps

/** q_shard_lineage contract: the layout-rule-derived row ranges must
  * agree with the ACTUAL store — every doc's claimed rows exist in the
  * q_shard_append layout, their doc spans contain the doc, and the
  * per-(shard, gen) token totals reconcile. */
class ShardLineageSpec extends SparkTestBase {
  import spark.implicits._

  test("lineage ranges agree with the real q_shard_append store") {
    val dir = ShardOps.writeShardBase(spark, sf)
    ShardOps.appendShardDelta(spark, sf)
    val store = spark.read.parquet(dir)
      .select($"shard".cast("long").as("shard"), $"gen".cast("long").as("gen"),
        $"seq_idx", $"n_ids", $"first_doc", $"last_doc")
      .collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("gen"),
        r.getAs[Long]("seq_idx")) ->
        (r.getAs[Long]("n_ids"), r.getAs[Long]("first_doc"),
          r.getAs[Long]("last_doc"))).toMap
    val lineage = q("q_shard_lineage").collect()
    assert(lineage.nonEmpty)
    lineage.foreach { r =>
      val (doc, sh, g) = (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Long]("gen"))
      val (fr, lr) = (r.getAs[Long]("first_row"), r.getAs[Long]("last_row"))
      assert(fr <= lr)
      (fr to lr).foreach { seq =>
        val row = store.get((sh, g, seq))
        assert(row.isDefined, s"doc $doc claims row ($sh,$g,$seq) " +
          "that does not exist in the store")
        val (_, fd, ld) = row.get
        assert(fd <= doc && doc <= ld,
          s"doc $doc outside row ($sh,$g,$seq) span [$fd,$ld]")
      }
    }
    // token totals reconcile: lineage n_tok sums to the store's n_ids
    // per (shard, gen)
    val lineageTok = lineage.groupBy(r =>
      (r.getAs[Long]("shard"), r.getAs[Long]("gen")))
      .view.mapValues(_.map(_.getAs[Long]("n_tok")).sum).toMap
    val storeTok = store.groupBy { case ((sh, g, _), _) => (sh, g) }
      .view.mapValues(_.values.map(_._1).sum).toMap
    assert(lineageTok === storeTok)
  }
}
