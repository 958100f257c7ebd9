package graft

import graft.operators.{GenerationLayout, ShardOps}
import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._

/** q_stream_pipeline_compact contract (r15 self-review redesign):
  * gen-0 files byte-untouched, superseded generations vacuumed, and —
  * the three refuted invariants of the first cut — PERIODIC cycles
  * preserve every earlier merge, crash windows re-derive the identical
  * store, and at-least-once replay duplicates cannot double tokens or
  * shift addresses. */
class StreamStoreCompactSpec extends SparkTestBase {
  import spark.implicits._

  private def view(dir: String) =
    StreamingOps.compactedStreamView(spark, dir)
      .orderBy($"shard", $"seq_idx").collect().toSeq

  /** The view's token stream per shard, in address order. */
  private def viewToks(dir: String): Seq[(Long, Long)] =
    StreamingOps.compactedStreamView(spark, dir)
      .select($"shard", $"seq_idx", posexplode(split($"ids_str", ",")))
      .toDF("shard", "seq_idx", "p", "tid")
      .orderBy($"shard", $"seq_idx", $"p")
      .select($"shard", $"tid".cast("long"))
      .as[(Long, Long)].collect().toSeq

  test("single cycle: gen-0 files byte-identical, sources vacuumed, " +
      "crash-retry (sources restored after the merge) reproduces the " +
      "identical view, further compact is a file-untouched no-op") {
    val pristine = java.nio.file.Paths
      .get(StreamingOps.streamPipelineStore(spark, sf))
    val dir = StreamingOps
      .indexArtifactDir("stream_pipe_store_compact_spec", sf)
    graft.Fs.deleteRecursively(dir)
    graft.Fs.copyRecursively(pristine, dir)
    val gen0Before = TestFs.crcByFile(dir).filter(_._1.contains("gen=0"))
    StreamingOps.compactStreamStore(spark, dir.toString)
    val after = TestFs.crcByFile(dir)
    assert(after.filter(_._1.contains("gen=0")) === gen0Before,
      "gen-0 files changed under compaction")
    assert(!after.keys.exists(_.contains("gen=1/")),
      "source generation not vacuumed")
    // cycle-1 target = Base + max(batch gens) = Base + 1
    val t1 = StreamingOps.CompactedGenBase + 1L
    assert(after.keys.exists(_.contains(s"gen=$t1")), "merge missing")
    val v1 = view(dir.toString)
    assert(v1.nonEmpty)
    // every row full except each shard's single final tail
    val tails = v1.groupBy(_.getLong(0)).values.map(rs =>
      rs.count(_.getLong(2) != ShardOps.SeqLen.toLong))
    assert(tails.forall(_ <= 1), "more than one under-filled row per shard")
    // CRASH RETRY: restore the vacuumed source gens from the pristine
    // copy (as if the vacuum never ran) and re-run — the deterministic
    // target is overwritten with identical content, never re-merged
    // as its own source
    val pCrc = TestFs.crcByFile(pristine)
    pCrc.keys.filter(_.contains("gen=1/")).foreach { rel =>
      val src = pristine.resolve(rel)
      val dst = dir.resolve(rel)
      java.nio.file.Files.createDirectories(dst.getParent)
      java.nio.file.Files.copy(src, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    StreamingOps.compactStreamStore(spark, dir.toString)
    assert(view(dir.toString) === v1, "retry diverged from first compact")
    assert(!TestFs.crcByFile(dir).keys.exists(_.contains("gen=1/")))
    // already-compacted store: a further run is a no-op, files untouched
    val settled = TestFs.crcByFile(dir)
    StreamingOps.compactStreamStore(spark, dir.toString)
    assert(TestFs.crcByFile(dir) === settled, "no-op compact touched files")
  }

  test("periodic cycles: compact -> append batch 2 (with a replay " +
      "duplicate) -> compact again keeps every earlier merge's tokens " +
      "and equals the admitted stream in admission order") {
    val pristine = java.nio.file.Paths
      .get(StreamingOps.streamPipelineStore(spark, sf))
    val dir = StreamingOps
      .indexArtifactDir("stream_pipe_store_compact_cycles", sf)
    graft.Fs.deleteRecursively(dir)
    graft.Fs.copyRecursively(pristine, dir)
    val accept = StreamingOps
      .indexArtifactDir("stream_pipe_store_compact_cycles_accept", sf)
    graft.Fs.deleteRecursively(accept)
    // pristine accept log must exist for the appended batch's gate; the
    // batch-2 docs below are disjoint new ids, so an empty log suffices
    spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StreamingOps.pipeAcceptSchema)
      .coalesce(1).write.mode("overwrite").parquet(accept.toString)
    StreamingOps.compactStreamStore(spark, dir.toString) // cycle 1
    val cycle1Toks = viewToks(dir.toString)
    // batch 2: fresh ids beyond the corpus (disjoint from batches 0/1),
    // synthesized from real texts so the frozen tokenizer applies
    val sp = StreamingOps.pipeMidpoint(spark, sf)
    val kept = StreamingOps.pipelineKeptDocs(spark, sf)
    val base = Tables.documents(spark, sf).select($"doc_id", $"text")
      .join(kept, Seq("doc_id"), "left_semi")
    val b2 = base.filter($"doc_id" < 50)
      .select(($"doc_id" + 4L * sp).as("doc_id"), $"text")
      .localCheckpoint()
    assert(b2.count() > 0)
    StreamingOps.pipelineBatchImpl(b2, 2L, sf, dir.toString,
      accept.toString, partitioned = true)
    StreamingOps.pipelineBatchImpl(b2, 2L, sf, dir.toString,
      accept.toString, partitioned = true) // at-least-once replay
    StreamingOps.compactStreamStore(spark, dir.toString) // cycle 2
    val got = viewToks(dir.toString)
    // earlier merges intact: cycle-1 tokens are a per-shard PREFIX of
    // the cycle-2 stream (the first cut deleted them here)
    val got1 = got.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val want1 = cycle1Toks.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    want1.foreach { case (sh, toks) =>
      assert(got1(sh).take(toks.size) === toks,
        s"shard $sh lost cycle-1 tokens in cycle 2")
    }
    // and the whole view == the admitted token stream in admission
    // order, batch 2 exactly once despite the replay duplicate
    val fed = base.unionAll(b2)
      .withColumn("bgen",
        when($"doc_id" >= 4L * sp, 2L)
          .otherwise(GenerationLayout.streamGenOf($"doc_id", sp)))
    val want = graft.operators.BpeOps
      .subwordIdsOf(spark, sf, fed.select($"doc_id", $"text"))
      .join(fed.select($"doc_id", $"bgen"), Seq("doc_id"))
      .select(GenerationLayout.shardOf($"doc_id").as("shard"),
        $"bgen", $"doc_id", $"pos", $"subpos", $"tid")
      .orderBy($"shard", $"bgen", $"doc_id", $"pos", $"subpos")
      .select($"shard", $"tid".cast("long"))
      .as[(Long, Long)].collect().toSeq
    assert(got === want, "cycle-2 view diverges from the admitted stream")
    val tails = view(dir.toString).groupBy(_.getLong(0)).values.map(rs =>
      rs.count(_.getLong(2) != ShardOps.SeqLen.toLong))
    assert(tails.forall(_ <= 1))
  }
}
