package graft

import graft.operators.AuditOps

/** The audit companions exist so the DRIVER catches algorithmic
  * regressions; these negative tests prove the flags actually flip when
  * the audited algorithm degrades (an audit that can't fail isn't an
  * audit). The green path is covered by the driver oracle itself plus
  * SmokeSpec.
  */
class AuditSpec extends SparkTestBase {
  import spark.implicits._

  test("fingerprint recall audit flips to 0 when the fingerprinter finds nothing") {
    val broken = AuditOps.fingerprintRecallAudit("x_broken_fp", 0.8,
      (s, _) => {
        import s.implicits._
        Seq.empty[(Long, Long)].toDF("doc1", "doc2")
      }, "synthetic total-recall-loss fingerprinter")
    val row = broken.fn(spark, sf).collect()(0)
    assert(row.getAs[Long]("n_neardup_pairs") > 0L,
      "ground truth must be non-empty for the flag to mean anything")
    assert(row.getAs[Long]("recall_ok") === 0L)
  }

  test("fingerprint recall audit stays 1 on the real simhash pipeline") {
    val row = q("q_dedup_simhash_audit").collect()(0)
    assert(row.getAs[Long]("recall_ok") === 1L)
  }

  test("ANN recall audit flips to 0 when the index returns nothing") {
    val broken = AuditOps.annRecallAudit("x_broken_ann", 1,
      (s, _) => {
        import s.implicits._
        Seq.empty[(Long, Long)].toDF("qid", "cid")
      }, "synthetic empty ANN index")
    val row = broken.fn(spark, sf).collect()(0)
    assert(row.getAs[Long]("n_exact_topk") === 50L)
    assert(row.getAs[Long]("recall_floor_ok") === 0L)
  }

  test("HLL audit flag computation brackets the exact count") {
    // the declared query's flag must be 1 on the real sketch...
    val rows = q("q_agg_hll_audit").collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("hll_ok") === 1L))
    // ...and the bracket itself must be falsifiable: a 10%-off estimate
    // fails the ±5% test the query encodes
    val exact = 150L
    val off = math.round(exact * 1.10)
    assert(math.abs(off - exact) > exact * 0.05)
  }
}
