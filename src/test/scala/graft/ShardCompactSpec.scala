package graft

import graft.operators.{BpeOps, ShardOps}

/** q_shard_compact contract: compaction touches only O(tail + delta) —
  * gen-0 files byte-identical, gen-1 directories vacuumed, all new bytes
  * under gen=2 — and the logical view is a perfect defragmentation:
  * per-shard dense seq from 0, every row full except the single final
  * tail, id stream conserved against the pre-compact store. */
class ShardCompactSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def dataFiles(dir: String): Map[String, (Long, String)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.startsWith("part-")) Seq(f) else Seq.empty
    walk(new java.io.File(dir)).map { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString
      f.getAbsolutePath -> (f.length(), md5)
    }.toMap
  }

  test("compaction is incremental at the file level: gen-0 untouched, " +
      "gen-1 vacuumed, new bytes only under gen=2") {
    val dir = ShardOps.compactShardDir(sf)
    ShardOps.writeShardBaseTo(spark, sf, dir)
    ShardOps.appendShardDeltaTo(spark, sf, dir)
    val before = dataFiles(dir)
    val base0 = before.filter(_._1.contains("gen=0"))
    assert(base0.nonEmpty && before.exists(_._1.contains("gen=1")))
    ShardOps.compactShards(spark, dir)
    val after = dataFiles(dir)
    base0.foreach { case (path, sig) =>
      assert(after.get(path) === Some(sig), s"gen-0 file rewritten: $path")
    }
    assert(!after.keySet.exists(_.contains("gen=1")),
      "vacuum left gen-1 files behind")
    (after.keySet -- before.keySet).foreach { p =>
      assert(p.contains("gen=2"), s"compaction created a non-gen-2 file: $p")
    }
    assert((after.keySet -- before.keySet).nonEmpty, "compaction added no files")
  }

  test("the compacted view is a perfect defragmentation with the id " +
      "stream conserved") {
    val dir = ShardOps.compactShardDir(sf)
    ShardOps.writeShardBaseTo(spark, sf, dir)
    ShardOps.appendShardDeltaTo(spark, sf, dir)
    // pre-compact stream per shard, in store order (gen, then seq)
    val pre = spark.read.parquet(dir)
      .select($"shard".cast("long").as("shard"), $"gen", $"seq_idx", $"ids_str")
      .orderBy($"shard", $"gen", $"seq_idx")
      .collect().groupBy(_.getAs[Long]("shard"))
      .map { case (s0, rs) => s0 -> rs.map(_.getAs[String]("ids_str")).mkString(",") }
    ShardOps.compactShards(spark, dir)
    val rows = ShardOps.compactedView(spark, dir)
      .orderBy($"shard", $"seq_idx").collect()
    assert(rows.nonEmpty)
    val post = rows.groupBy(_.getAs[Long]("shard"))
    post.foreach { case (shard, rs) =>
      val seqs = rs.map(_.getAs[Long]("seq_idx")).toSeq
      assert(seqs === (0L until rs.length).toSeq,
        s"shard $shard not dense from 0 after compaction")
      rs.init.foreach(r => assert(
        r.getAs[Long]("n_ids") === ShardOps.SeqLen.toLong,
        s"shard $shard has an interior short row after compaction"))
      // the whole point: the id stream is bit-identical, only addresses
      // defragment
      assert(rs.map(_.getAs[String]("ids_str")).mkString(",") === pre(shard),
        s"shard $shard id stream changed under compaction")
    }
    // conservation against the source tokenizer
    val total = BpeOps.subwordIdRows(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_ids")).sum === total)
  }

  test("compaction is re-entrant: a crash-before-vacuum retry overwrites " +
      "gen-2 without duplicates, and a post-success call is a no-op") {
    val dir = ShardOps.compactShardDir(sf)
    ShardOps.writeShardBaseTo(spark, sf, dir)
    ShardOps.appendShardDeltaTo(spark, sf, dir)
    // crash point: gen=2 landed, gen=1 NOT yet vacuumed (ADVICE r13 —
    // mode(append) here used to double the gen-2 rows on retry)
    ShardOps.repackDelta(spark, dir)
    assert(spark.read.parquet(dir).filter($"gen" === 2).count() > 0)
    ShardOps.compactShards(spark, dir) // the retry
    val view = ShardOps.compactedView(spark, dir)
      .orderBy($"shard", $"seq_idx").collect()
    val dupes = view.groupBy(r =>
      (r.getAs[Long]("shard"), r.getAs[Long]("seq_idx")))
      .filter(_._2.length > 1)
    assert(dupes.isEmpty, s"retry duplicated packed rows: ${dupes.keys.take(3)}")
    // id-stream conservation against the source tokenizer
    assert(view.map(_.getAs[Long]("n_ids")).sum ===
      BpeOps.subwordIdRows(spark, sf).count())
    // post-success re-run: gen-1 is gone — must be a no-op, NOT a
    // re-pack of the stale shadowed base tail over the good gen-2 rows
    val before = dataFiles(dir)
    ShardOps.compactShards(spark, dir)
    assert(dataFiles(dir) === before, "post-success compact touched files")
  }

  test("the declared read view plans partition pruning + a pushed n_ids " +
      "filter (stale tails skipped at the reader)") {
    val df = q("q_shard_compact")
    val scans = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size === 2, "view must be a union of two pruned reads")
    scans.foreach { f =>
      assert(f.metadata.get("PartitionFilters").exists(_.contains("gen")),
        "generation not pruned at the partition level")
    }
    assert(scans.exists(_.metadata.get("PushedFilters")
        .exists(m => m != "[]" && m.contains("n_ids"))),
      "n_ids tail-shadow filter not pushed to parquet")
  }
}
