package graft.operators

import graft.{QueryDef, QueryPack, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Window anomaly detection over the event stream — the alerting pass
  * the reference's monitoring domain implies one tier above its
  * windowed averages: flag 5-minute windows whose value sum deviates
  * more than k standard deviations from the event-type's own
  * distribution.
  *
  * Exactness: the z-score test is evaluated in CROSS-MULTIPLIED integer
  * form — `(x·m − S1)² > k²·(m·S2 − S1²)` with x the window sum in
  * cents, m the window count, S1/S2 the per-type sum and sum-of-squares
  * — so no division, no sqrt, no float ever enters the decision
  * (Chebyshev/z-flagging made rational; the same substitution
  * discipline as the linear idf and the TVD drift). Intermediates
  * exceed 2^63, so each engine evaluates them in its native exact wide
  * type: DECIMAL(38,0) here (value range ≪ 10^38), HUGEINT in the
  * DuckDB oracle. Only the flag and the small exact columns cross
  * engines.
  *
  * Scale shape: one windowed aggregation (partial+final, the
  * q_agg_avg_window5m plan), a 5-row per-type moment relation attached
  * by broadcast, and a pure map for the flag — no second corpus pass,
  * no window-by-window join.
  */
object AnomalyOps extends QueryPack {

  /** Flag threshold: k standard deviations (k² in the integer form). */
  private[graft] val KSigma = 3L

  private def wide(c: Column): Column = c.cast("decimal(38,0)")

  /** The moment + z-flag epilogue over a CLOSED-window relation
    * (event_type, win_start, n_events, sum_cents) — shared by the batch
    * query and the streaming gate (q_stream_anomaly), whose windowed
    * aggregation arrives from the watermarked stream instead. The
    * moment relation is event-type-cardinality-sized and broadcast;
    * the flag is a pure map. */
  private[graft] def flagWindows(w: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import w.sparkSession.implicits._
    val moments = w.groupBy($"event_type")
      .agg(count(lit(1)).as("m"), sum($"sum_cents").as("s1"),
        sum(wide($"sum_cents") * wide($"sum_cents")).as("s2"))
      .select($"event_type", $"m", wide($"s1").as("s1"), wide($"s2").as("s2"))
    w.join(broadcast(moments), "event_type")
      .select($"win_start", $"event_type", $"n_events", $"sum_cents",
        // (x·m − S1)² > k²·(m·S2 − S1²), all in DECIMAL(38,0)
        when(
          pow2(wide($"sum_cents") * wide($"m") - $"s1") >
            lit(KSigma * KSigma) * (wide($"m") * $"s2" - pow2($"s1")),
          1L).otherwise(0L).as("is_outlier"))
      .orderBy($"event_type", $"win_start")
  }

  private val anomalyWindows = QueryDef(
    "q_anomaly_windows",
    (s, d) => {
      import s.implicits._
      val w = Tables.events(s, d)
        .select($"event_type", window($"ts", "5 minutes").as("win"),
          ($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
        .groupBy($"event_type", $"win")
        .agg(count(lit(1)).as("n_events"), sum($"cents").as("sum_cents"))
        .select($"event_type", unix_timestamp($"win.start").as("win_start"),
          $"n_events", $"sum_cents".cast("long").as("sum_cents"))
      flagWindows(w)
    },
    Some(s"""WITH w AS (
        SELECT event_type,
          CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 AS win_start,
          CAST(count(*) AS BIGINT) AS n_events,
          CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS sum_cents
        FROM events GROUP BY 1, 2),
      mo AS (
        SELECT event_type, CAST(count(*) AS HUGEINT) AS m,
          CAST(sum(sum_cents) AS HUGEINT) AS s1,
          sum(CAST(sum_cents AS HUGEINT) * CAST(sum_cents AS HUGEINT)) AS s2
        FROM w GROUP BY event_type)
      SELECT w.win_start, w.event_type, w.n_events, w.sum_cents,
        CAST(CASE WHEN
            (CAST(w.sum_cents AS HUGEINT) * mo.m - mo.s1)
              * (CAST(w.sum_cents AS HUGEINT) * mo.m - mo.s1)
            > ${KSigma * KSigma} * (mo.m * mo.s2 - mo.s1 * mo.s1)
          THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
      FROM w JOIN mo USING (event_type)
      ORDER BY event_type, win_start"""),
    s"Window anomaly flags: |z| > $KSigma in cross-multiplied integer " +
      "form (no division/sqrt/float in the decision); one windowed " +
      "aggregation + a per-type moment broadcast + a map-side flag")

  /** x² in DECIMAL(38,0) (named to keep the flag expression readable). */
  private def pow2(c: Column): Column = c * c

  override def defs: Seq[QueryDef] = Seq(anomalyWindows)
}
