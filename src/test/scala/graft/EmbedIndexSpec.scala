package graft

import org.apache.spark.sql.functions._

import graft.operators.{EmbedIndexOps, GenerationLayout}

/** The persisted embedding-ANN index lifecycle (VERDICT r15 task 3):
  * indexed search == per-run rebuild, the maintain pass is
  * file-incremental, stream maintenance covers every batch with replay
  * collapse, and RTBF leaves untouched generations byte-identical while
  * deleted vectors can never surface from any side of the search. */
class EmbedIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def md5s(base: java.nio.file.Path): Map[String, String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.startsWith("part-")) Seq(f) else Seq.empty
    walk(base.toFile).map { f =>
      f.getAbsolutePath -> java.security.MessageDigest.getInstance("MD5")
        .digest(java.nio.file.Files.readAllBytes(f.toPath))
        .map("%02x".format(_)).mkString
    }.toMap
  }

  test("rad_sig kernel: deterministic, matches an independent " +
      "re-derivation of the ±1-plane integer sign sums") {
    val rows = Tables.embeddings(spark, sf).limit(50)
      .select($"vec_id",
        graft.functions.ScaledDot.decimal_scale6($"embedding").as("sv"))
      .as[(Long, Seq[Long])].collect()
    assert(rows.nonEmpty)
    val (bands, bits, seed) = (4, 8, 20260816L)
    rows.foreach { case (vid, sv) =>
      // independent reference: recompute from mix64 directly
      val expect = new Array[Long](bands)
      for (k <- 0 until bands * bits) {
        val acc = sv.indices.map { i =>
          val s = graft.functions.RadSig.mix64(seed + k.toLong * sv.size + i) < 0L
          if (s) sv(i) else -sv(i)
        }.sum
        if (acc > 0) expect(k / bits) |= 1L << (k % bits)
      }
      val got = spark.range(1).select(
        graft.functions.RadSig.rad_sig(
          typedLit(sv), bands, bits, seed)).head().getSeq[Long](0)
      assert(got.toSeq === expect.toSeq, s"vec $vid signature diverges")
    }
  }

  test("persisted-index search == per-run rebuild, the maintain pass is " +
      "file-incremental, and the search plan reads the index artifact") {
    spark.sharedState.cacheManager.clearCache()
    val base = java.nio.file.Paths.get("target", "test-embed-index")
      .toAbsolutePath
    graft.Fs.deleteRecursively(base)
    EmbedIndexOps.writeEmbedIndexBase(spark, sf, base.toString)
    val gen0 = md5s(base)
    assert(gen0.nonEmpty && gen0.keySet.forall(_.contains("gen=0")))
    EmbedIndexOps.appendEmbedIndexDelta(spark, sf, base.toString)
    val after = md5s(base)
    gen0.foreach { case (p, sig) =>
      assert(after.get(p) === Some(sig), s"base index file rewritten: $p")
    }
    assert((after.keySet -- gen0.keySet).forall(_.contains("gen=1")))
    // the union of generations covers every vector exactly once, with
    // Bands rows each
    val nVec = Tables.embeddings(spark, sf).count()
    val idx = spark.read.parquet(base.toString)
    assert(idx.select($"vec_id").distinct().count() === nVec)
    assert(idx.groupBy($"vec_id").count().filter($"count" =!= 4)
      .count() === 0L, "a vector has != Bands band rows")
    // search-over-index is row-for-row the per-run rebuild
    val indexed = q("q_simsearch_ann_index").collect().toSeq
    val rebuilt = q("q_simsearch_ann_rad").collect().toSeq
    assert(indexed.nonEmpty && indexed === rebuilt)
    // the plan proves the index is what is read on the candidate side
    val scans = q("q_simsearch_ann_index").queryExecution.sparkPlan
      .collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metadata.getOrElse("Location", "")
      }
    assert(scans.exists(_.contains("embed_rad_index")),
      "indexed search does not scan the persisted index")
  }

  test("stream-maintained index search == per-run rebuild, covers every " +
      "batch, and a replayed batch collapses under the distinct read") {
    spark.sharedState.cacheManager.clearCache()
    val streamed = q("q_stream_ann_index").collect().toSeq
    val rebuilt = q("q_simsearch_ann_rad").collect().toSeq
    assert(streamed.nonEmpty && streamed === rebuilt)
    val log = spark.read.parquet(
      EmbedIndexOps.streamEmbedIndexLog(spark, sf))
    assert(log.select($"gen").distinct().count() >= 2L,
      "stream index log has a single generation — not incremental")
    val nVec = Tables.embeddings(spark, sf).count()
    assert(log.select($"vec_id").distinct().count() === nVec)
    assert(log.groupBy($"vec_id")
      .agg(countDistinct($"gen").as("g")).filter($"g" > 1).count() === 0L,
      "a vector landed in more than one generation")
    // at-least-once replay: re-append one batch verbatim; the declared
    // search result must not change (distinct collapse)
    val scratch = java.nio.file.Paths.get("target", "test-stream-embed-idx")
      .toAbsolutePath
    graft.Fs.deleteRecursively(scratch)
    val vecs = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    EmbedIndexOps.streamEmbedIndexBatch(vecs.toDF(), 0L, scratch.toString)
    val once = spark.read.parquet(scratch.toString).count()
    EmbedIndexOps.streamEmbedIndexBatch(vecs.toDF(), 0L, scratch.toString)
    val log2 = spark.read.parquet(scratch.toString)
    assert(log2.count() === 2 * once, "replay should append row-identical data")
    assert(log2.select($"vec_id", $"sv", $"band", $"bkey").distinct()
      .count() === once, "replayed rows must collapse under distinct")
  }

  test("index forget: bounded blast radius (gen-1-only delete leaves " +
      "gen-0 files byte-identical) and deleted ids vanish from the index") {
    val base = java.nio.file.Paths.get("target", "test-embed-index-forget")
      .toAbsolutePath
    graft.Fs.deleteRecursively(base)
    EmbedIndexOps.writeEmbedIndexBase(spark, sf, base.toString)
    EmbedIndexOps.appendEmbedIndexDelta(spark, sf, base.toString)
    val before = md5s(base)
    // delete set confined to generation 1 (the HoldoutMod slice): the
    // layout rule says ONLY gen=1 may rewrite
    val pred = $"vec_id" % graft.operators.BpeOps.HoldoutMod === 0 &&
      $"vec_id" % 3 === 0
    val deleted = Tables.embeddings(spark, sf).filter(pred)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(deleted.nonEmpty, "fixture delete set is empty — vacuous")
    EmbedIndexOps.forgetEmbedIndex(spark, sf, base.toString, pred)
    val after = md5s(base)
    before.filter(_._1.contains("gen=0")).foreach { case (p, sig) =>
      assert(after.get(p) === Some(sig),
        s"gen-0 file rewritten by a gen-1-only delete: $p")
    }
    val left = spark.read.parquet(base.toString)
      .select($"vec_id").distinct().collect().map(_.getLong(0)).toSet
    assert(deleted.forall(!left.contains(_)), "a deleted id survived")
    val expected = Tables.embeddings(spark, sf).filter(!pred)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(left === expected, "survivor set diverges")
  }

  test("declared forget query: no deleted id appears as qid or cid, " +
      "and per-probe ranking is dense from 1 with dot non-increasing") {
    val rows = q("q_ann_index_forget").collect()
    assert(rows.nonEmpty)
    val fm = graft.operators.ShardOps.ForgetMod
    val fr = graft.operators.ShardOps.ForgetRes
    rows.foreach { r =>
      assert(r.getAs[Long]("qid") % fm !== fr, "deleted probe replayed")
      assert(r.getAs[Long]("cid") % fm !== fr, "deleted vector surfaced")
    }
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rs) =>
      val byRank = rs.sortBy(_.getAs[Long]("rnk"))
      assert(byRank.map(_.getAs[Long]("rnk")).toSeq ===
        (1L to byRank.length).toSeq, s"probe $qid ranks not dense")
      val dots = byRank.map(_.getAs[Double]("dot")).toSeq
      assert(dots === dots.sorted.reverse, s"probe $qid dot not sorted")
      assert(byRank.length <= 5)
    }
  }

  test("the banded search plan broadcasts the probe side and joins " +
      "equi-only (no BNLJ/cartesian)") {
    spark.sharedState.cacheManager.clearCache()
    val plan = q("q_simsearch_ann_index").queryExecution.executedPlan
      .toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "candidate generation degenerated to all-pairs")
    assert(plan.contains("BroadcastHashJoin"),
      "bounded probe set should broadcast into the band equi-join")
  }

  test("EmbedIndex layout: forget blast radius is derivable from ids " +
      "alone and both generations are non-vacuous on the fixture") {
    val lay = GenerationLayout.EmbedIndex
    val vecs = Tables.embeddings(spark, sf)
    val byGen = vecs.groupBy(lay.genOf($"vec_id").as("gen")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byGen.keySet === Set(0L, 1L), s"generations: ${byGen.keySet}")
    assert(byGen.values.forall(_ > 0))
  }
}
