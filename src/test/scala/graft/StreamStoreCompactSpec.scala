package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._

/** q_stream_pipeline_compact contract: gen-0 files byte-untouched,
  * superseded generations vacuumed, and the crash-retry window safe —
  * a retry after the merged write but before the vacuum must reproduce
  * the identical view, not double the content (the fixed-target-gen
  * rule the operator comment argues). */
class StreamStoreCompactSpec extends SparkTestBase {
  import spark.implicits._

  private def crcOf(root: java.nio.file.Path): Map[String, Long] = {
    val walk = java.nio.file.Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("part-"))
        .map { p =>
          val crc = new java.util.zip.CRC32()
          crc.update(java.nio.file.Files.readAllBytes(p))
          root.relativize(p).toString -> crc.getValue
        }.toMap
    } finally walk.close()
  }

  private def view(dir: String) =
    StreamingOps.compactedStreamView(spark, dir)
      .orderBy($"shard", $"seq_idx").collect().toSeq

  test("compaction: gen-0 files byte-identical, source generations " +
      "vacuumed, retry-after-crash reproduces the identical view, " +
      "second compact is a no-op") {
    val pristine = java.nio.file.Paths
      .get(StreamingOps.streamPipelineStore(spark, sf))
    val dir = StreamingOps
      .indexArtifactDir("stream_pipe_store_compact_spec", sf)
    graft.Fs.deleteRecursively(dir)
    graft.Fs.copyRecursively(pristine, dir)
    val gen0Before = crcOf(dir).filter(_._1.contains("gen=0"))
    StreamingOps.compactStreamStore(spark, dir.toString)
    val after = crcOf(dir)
    assert(after.filter(_._1.contains("gen=0")) === gen0Before,
      "gen-0 files changed under compaction")
    assert(!after.keys.exists(_.contains("gen=1/")),
      "source generation not vacuumed")
    assert(after.keys.exists(
      _.contains(s"gen=${StreamingOps.CompactedGen}")),
      "merged generation missing")
    val v1 = view(dir.toString)
    assert(v1.nonEmpty)
    // every row full except each shard's single final tail
    val tails = v1.groupBy(_.getLong(0)).values.map(rs =>
      rs.count(_.getLong(2) != graft.operators.ShardOps.SeqLen.toLong))
    assert(tails.forall(_ <= 1), "more than one under-filled row per shard")
    // CRASH RETRY: restore the vacuumed source gens from the pristine
    // copy (as if the vacuum never ran) and re-run — the fixed target
    // is overwritten with identical content, never re-merged as source
    val pCrc = crcOf(pristine)
    pCrc.keys.filter(_.contains("gen=1/")).foreach { rel =>
      val src = pristine.resolve(rel)
      val dst = dir.resolve(rel)
      java.nio.file.Files.createDirectories(dst.getParent)
      java.nio.file.Files.copy(src, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    StreamingOps.compactStreamStore(spark, dir.toString)
    assert(view(dir.toString) === v1, "retry diverged from first compact")
    assert(!crcOf(dir).keys.exists(_.contains("gen=1/")))
    // already-compacted store: a further run is a no-op, files untouched
    val settled = crcOf(dir)
    StreamingOps.compactStreamStore(spark, dir.toString)
    assert(crcOf(dir) === settled, "no-op compact touched files")
  }
}
