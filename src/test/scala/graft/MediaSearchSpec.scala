package graft

import graft.functions.{MediaCodec, PerceptualHash}
import graft.operators.MultimodalOps

/** q_simsearch_media contract: the half-bright perturbation's hash flips
  * are confined to ONE column band (the structural-recall argument the
  * audit pins), the banded plan never degenerates to all-pairs, and the
  * per-probe ranking is well-formed. */
class MediaSearchSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("half-bright flips live in exactly one grid column (column-" +
      "major banding => >=3 shared bands with the source)") {
    val docs = Tables.documents(spark, sf).filter($"doc_id" % 2 === 0)
      .select($"doc_id", encode($"text", "UTF-8"))
      .as[(Long, Array[Byte])].filter(_._2.nonEmpty).take(40)
    assert(docs.nonEmpty)
    docs.foreach { case (id, tb) =>
      val base = MediaCodec.encodeBmp(id, tb)
      val probe = MultimodalOps.halfBright(base)
      val h0 = PerceptualHash.dhash(base)
      val h1 = PerceptualHash.dhash(probe)
      assert(h0 != null && h1 != null)
      val diff = h0.longValue ^ h1.longValue
      // changed bit positions k = gy*8 + gx: all share one gx (column)
      val cols = (0 until 64).filter(k => ((diff >>> k) & 1L) == 1L)
        .map(_ & 7).distinct
      assert(cols.size <= 1,
        s"doc $id: flips span columns $cols — the structural-recall " +
          "argument would be broken")
      // and the distance is within the one-flip-per-row envelope
      assert(java.lang.Long.bitCount(diff) <= 8)
    }
  }

  test("the banded search plan is equi-join only (no BNLJ/cartesian), " +
      "with a partitioned ranking window") {
    // the audit registers .cache() on exactly this top-k subtree; if it
    // ran earlier in this JVM (e.g. the ScaleTechniquesSpec plan sweep
    // builds every declared query), the plan collapses into an
    // InMemoryTableScan and the shape assertions below see nothing —
    // assert on the UNCACHED plan
    spark.sharedState.cacheManager.clearCache()
    val df = q("q_simsearch_media")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "candidate generation degenerated to all-pairs")
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "ranking window must partition on probe_id")
  }

  test("per-probe ranking is dense from 1, hamming non-decreasing, " +
      "and every probe's source is a candidate") {
    val rows = q("q_simsearch_media").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("probe_id")).foreach { case (pid, rs) =>
      val byRank = rs.sortBy(_.getAs[Long]("rnk"))
      assert(byRank.map(_.getAs[Long]("rnk")).toSeq ===
        (1L to byRank.length).toSeq, s"probe $pid ranks not dense")
      val hs = byRank.map(_.getAs[Long]("hamming")).toSeq
      assert(hs === hs.sorted, s"probe $pid hamming not non-decreasing")
      assert(byRank.length <= MultimodalOps.TopK)
    }
    // the structural guarantee, end to end on the fixture corpus
    val cand = MultimodalOps.mediaCand(spark, sf)
      .filter($"neighbor_id" === $"probe_id" - MultimodalOps.ProbeOff)
      .count()
    val nProbes = Tables.documents(spark, sf)
      .filter($"doc_id" % 6 === 0 && length($"text") > 0).count()
    assert(cand === nProbes, "a probe lost its source from the candidates")
  }
}
