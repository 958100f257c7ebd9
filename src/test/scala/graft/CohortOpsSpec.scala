package graft

import org.apache.spark.sql.functions._

/** Cohort/funnel invariants plus an exact local replay of the funnel on
  * the fixture events. */
class CohortOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("q_cohort_retention: offset-0 retention is exactly 1e6 and " +
      "retention never exceeds it; actives bound by cohort size") {
    val rows = q("q_cohort_retention")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (cohort, off, nActive, nCohort, mil) =>
      assert(off >= 0, s"cohort $cohort negative offset")
      assert(nActive >= 1 && nActive <= nCohort)
      assert(mil <= 1000000L)
      if (off == 0) assert(mil == 1000000L && nActive == nCohort,
        s"cohort $cohort must be fully active on its own day")
    }
    // cohort sizes partition the user base: Σ n_cohort (one per cohort)
    // equals the distinct active users
    val users = Tables.events(spark, sf).select($"user_id").distinct().count()
    val sumCohorts = rows.filter(_._2 == 0).map(_._4).sum
    assert(sumCohorts == users)
  }

  test("q_funnel_conversion matches a local first-touch replay") {
    import graft.operators.CohortOps
    val ev = Tables.events(spark, sf)
      .select($"user_id", unix_timestamp($"ts").as("ts_s"), $"event_type")
      .as[(Long, Long, String)].collect()
    val firstView = ev.filter(_._3 == "view")
      .groupBy(_._1).map { case (u, es) => u -> es.map(_._2).min }
    val conv = ev.filter(_._3 == "purchase")
      .flatMap { case (u, t, _) =>
        firstView.get(u).filter(v =>
          t >= v && t <= v + CohortOps.FunnelWindowSec).map(_ => (u, t))
      }
      .groupBy(_._1).map { case (u, es) => u -> es.map(_._2).min }
    def mil(n: Long, d: Long): Long =
      (BigDecimal(n).setScale(2) / d)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .*(1000000L).toLongExact
    val expect = firstView.toSeq.groupBy(_._1 % 10).map { case (b, us) =>
      val nv = us.size.toLong
      val cs = us.flatMap { case (u, v) => conv.get(u).map(_ - v) }
      (b, nv, cs.size.toLong, cs.sum, mil(cs.size.toLong, nv))
    }.toSeq.sortBy(_._1)
    val got = q("q_funnel_conversion")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expect)
    // at this fixture the funnel must be non-trivial in both directions
    assert(got.map(_._3).sum > 0, "no conversions — vacuous funnel")
    assert(got.exists(r => r._3 < r._2), "every viewer converted — vacuous")
  }
}
