package graft

import org.apache.spark.sql.functions._

/** q_anomaly_windows: the integer cross-multiplied z-flag must equal an
  * exact BigInt replay of the same decision, and the flag must be
  * non-vacuous in both directions on the fixture. */
class AnomalyOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("anomaly flags match an exact BigInt replay of the " +
      "cross-multiplied z-test") {
    import graft.operators.AnomalyOps
    val got = q("q_anomaly_windows")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    val byType = got.groupBy(_._2)
    byType.foreach { case (et, rows) =>
      val xs = rows.map(r => BigInt(r._4))
      val m = BigInt(xs.size)
      val s1 = xs.sum
      val s2 = xs.map(x => x * x).sum
      val k2 = BigInt(AnomalyOps.KSigma * AnomalyOps.KSigma)
      rows.foreach { case (win, _, _, x, flag) =>
        val dev = BigInt(x) * m - s1
        val expect = if (dev * dev > k2 * (m * s2 - s1 * s1)) 1L else 0L
        assert(flag == expect, s"$et window $win flag diverges")
      }
    }
    // non-vacuous on the fixture: some flagged, most not
    val flagged = got.count(_._5 == 1L)
    assert(flagged > 0 && flagged < got.size / 10,
      s"flag vacuous or saturated: $flagged of ${got.size}")
  }

  test("window sums reconcile with the raw event stream") {
    val got = q("q_anomaly_windows")
      .agg(sum($"n_events"), sum($"sum_cents"))
      .as[(Long, Long)].head()
    val raw = Tables.events(spark, sf)
      .agg(count(lit(1)),
        sum(($"value".cast("decimal(18,2)") * 100).cast("long")))
      .as[(Long, Long)].head()
    assert(got == raw, "window partition must cover every event exactly once")
  }
}
