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

  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.DataFrame

  /** Per-doc source token order (the pack rule's within-doc order). */
  private def docTokens: DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"pos", $"subpos")
    graft.operators.BpeOps.subwordIdRows(spark, sf)
      .withColumn("k", row_number().over(w).cast("long") - 1L)
      .select($"doc_id", $"k", $"tid".cast("string").as("tid"))
  }

  test("post-compact lineage addresses every token of the real compacted " +
      "store, straddles included") {
    val dir = ShardOps.compactShardDir(sf)
    ShardOps.writeShardBaseTo(spark, sf, dir)
    ShardOps.appendShardDeltaTo(spark, sf, dir)
    ShardOps.compactShards(spark, dir)
    // actual: every live token's (shard, unified position, tid)
    val actual = ShardOps.compactedView(spark, dir)
      .select($"shard", $"seq_idx", posexplode(split($"ids_str", ",")))
      .toDF("shard", "seq_idx", "p", "tid")
      .select($"shard",
        ($"seq_idx" * ShardOps.SeqLen + $"p").as("gpos"), $"tid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // expected: lineage gstart + within-doc token order — if ANY doc's
    // claimed address range is off by even one row, the sets differ
    val lineage = ShardOps.compactLineage(spark, sf)
    val expected = docTokens
      .join(lineage.select($"doc_id", $"shard", $"gstart"), Seq("doc_id"))
      .select($"shard", ($"gstart" + $"k").as("gpos"), $"tid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(actual.nonEmpty && actual === expected)
    // physical generation of both span ends matches the claim (the view
    // with its origin generation, stale shadowed tail excluded)
    val all = spark.read.parquet(dir)
    val rowGen = all.filter($"gen" === 0 && $"n_ids" === ShardOps.SeqLen)
      .unionAll(all.filter($"gen" === 2))
      .select($"shard".cast("long"), $"seq_idx", $"gen".cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val lin = lineage.collect()
    lin.foreach { r =>
      val sh = r.getAs[Long]("shard")
      assert(rowGen((sh, r.getAs[Long]("first_row"))) ===
        r.getAs[Long]("first_gen"))
      assert(rowGen((sh, r.getAs[Long]("last_row"))) ===
        r.getAs[Long]("last_gen"))
    }
    // the hard case is represented: some doc straddles gen 0 / gen 2
    assert(lin.exists(r => r.getAs[Long]("first_gen") === 0L &&
      r.getAs[Long]("last_gen") === 2L),
      "fixture degenerated: no doc straddles the full-row boundary")
  }

  test("post-forget lineage addresses every surviving token of the real " +
      "post-delete store") {
    val dir = ShardOps.forgetShardDir(sf)
    ShardOps.writeShardBaseTo(spark, sf, dir)
    ShardOps.appendShardDeltaTo(spark, sf, dir)
    ShardOps.forgetDocs(spark, sf, dir)
    val actual = spark.read.parquet(dir)
      .select($"shard".cast("long").as("shard"), $"gen".cast("long").as("gen"),
        $"seq_idx", posexplode(split($"ids_str", ",")))
      .toDF("shard", "gen", "seq_idx", "p", "tid")
      .select($"shard", $"gen",
        ($"seq_idx" * ShardOps.SeqLen + $"p").as("gpos"), $"tid")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    val expected = docTokens
      .join(q("q_shard_lineage_forget")
        .select($"doc_id", $"shard", $"gen", $"gstart"), Seq("doc_id"))
      .select($"shard", $"gen", ($"gstart" + $"k").as("gpos"), $"tid")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    // set equality is the whole claim: every surviving token is where
    // lineage says (no survivor missing, no deleted token present, no
    // address drift in the re-packed partitions)
    assert(actual.nonEmpty && actual === expected)
  }
}
