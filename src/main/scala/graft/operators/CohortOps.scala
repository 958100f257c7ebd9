package graft.operators

import graft.{QueryDef, QueryPack, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Behavioral analytics over the event stream: cohort retention and
  * funnel conversion — the product-analytics pair every warehouse runs
  * (the reference's stack stops at windowed averages; these are the
  * standard compositions one tier up).
  *
  * Scale shape: the event stream reduces PER USER as early as possible
  * and everything downstream operates on user-cardinality relations.
  * Retention scans events ONCE into a cached (user, day) working set
  * read by all three consumers. The funnel makes two predicate-pruned
  * scans (view leg, purchase leg — each reads 3 columns and filters at
  * the scan); the purchase stream then shuffles on user_id against the
  * user-sized firstView relation — a linear event-grain shuffle, never
  * an event×event join — and all later aggregations are
  * output-cardinality-bounded.
  *
  * Rates ship in exact integer millionths (the engine's mil idiom), so
  * the DuckDB replay is bit-exact.
  */
object CohortOps extends QueryPack {

  /** Epoch-day bucket over a `ts_s` epoch-seconds column (events span
    * ~30 days in the fixtures; a longer deployment swaps the divisor for
    * weeks without plan change). Integer `div`, never `/`. */
  private def day: Column = expr("ts_s div 86400")

  import Exact.{mil, milSql}

  // ------------------------------------------------ q_cohort_retention
  private val cohortRetention = QueryDef(
    "q_cohort_retention",
    (s, d) => {
      import s.implicits._
      // (user, active day) — ONE event scan + user-keyed shuffle; cached
      // because three consumers read it (first-day, cohort sizes, the
      // retention join) and it is the op's user×days working set, not
      // the event-grain input (the searchTerm tf convention)
      val active = Tables.events(s, d)
        .select($"user_id", unix_timestamp($"ts").as("ts_s"))
        .select($"user_id", day.as("day"))
        .distinct()
        .cache()
      val first = active.groupBy($"user_id").agg(min($"day").as("cohort"))
      val sizes = first.groupBy($"cohort").agg(count(lit(1)).as("n_cohort"))
      active.join(first, "user_id")
        .groupBy($"cohort", ($"day" - $"cohort").as("day_offset"))
        .agg(count(lit(1)).as("n_active"))
        .join(broadcast(sizes), "cohort")
        .select($"cohort", $"day_offset", $"n_active", $"n_cohort",
          mil($"n_active", $"n_cohort").as("retention_mil"))
        .orderBy($"cohort", $"day_offset")
    },
    Some(s"""WITH active AS (
        SELECT DISTINCT user_id,
          CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
        FROM events),
      first AS (SELECT user_id, min(day) AS cohort FROM active
        GROUP BY user_id),
      sizes AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_cohort
        FROM first GROUP BY cohort),
      ret AS (
        SELECT f.cohort, a.day - f.cohort AS day_offset,
          CAST(count(*) AS BIGINT) AS n_active
        FROM active a JOIN first f USING (user_id)
        GROUP BY 1, 2)
      SELECT r.cohort, r.day_offset, r.n_active, s.n_cohort,
        ${milSql("r.n_active", "s.n_cohort")} AS retention_mil
      FROM ret r JOIN sizes s USING (cohort)
      ORDER BY cohort, day_offset"""),
    "Cohort retention: per (first-active-day cohort, day offset) active " +
      "share in exact millionths; one user-keyed shuffle, user-sized joins")

  // ------------------------------------------------ q_funnel_conversion
  /** Conversion window: a purchase within this many seconds of the
    * user's first view counts as converted. */
  private[graft] val FunnelWindowSec = 86400L * 7

  private val funnelConversion = QueryDef(
    "q_funnel_conversion",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select($"user_id", unix_timestamp($"ts").as("ts_s"), $"event_type")
      val firstView = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts_s").as("v_ts"))
      // first purchase AT OR AFTER the first view, within the window —
      // the purchase stream joins the user-sized firstView relation, so
      // the only event-grain work is one filtered scan
      val conv = ev.filter($"event_type" === "purchase")
        .join(firstView, "user_id")
        .filter($"ts_s" >= $"v_ts" && $"ts_s" <= $"v_ts" + FunnelWindowSec)
        .groupBy($"user_id").agg(min($"ts_s").as("p_ts"))
      firstView.join(conv, Seq("user_id"), "left_outer")
        .groupBy(($"user_id" % 10).as("bucket"))
        .agg(count(lit(1)).as("n_viewers"),
          count($"p_ts").as("n_converted"),
          coalesce(sum($"p_ts" - $"v_ts"), lit(0L)).cast("long")
            .as("sum_delay_s"))
        .select($"bucket", $"n_viewers", $"n_converted", $"sum_delay_s",
          mil($"n_converted", $"n_viewers").as("conv_mil"))
        .orderBy($"bucket")
    },
    Some(s"""WITH ev AS (
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_type
        FROM events),
      fv AS (SELECT user_id, min(ts_s) AS v_ts FROM ev
        WHERE event_type = 'view' GROUP BY user_id),
      conv AS (
        SELECT e.user_id, min(e.ts_s) AS p_ts
        FROM ev e JOIN fv USING (user_id)
        WHERE e.event_type = 'purchase'
          AND e.ts_s >= fv.v_ts AND e.ts_s <= fv.v_ts + $FunnelWindowSec
        GROUP BY e.user_id)
      SELECT fv.user_id % 10 AS bucket,
        CAST(count(*) AS BIGINT) AS n_viewers,
        CAST(count(conv.p_ts) AS BIGINT) AS n_converted,
        CAST(coalesce(sum(conv.p_ts - fv.v_ts), 0) AS BIGINT) AS sum_delay_s,
        ${milSql("count(conv.p_ts)", "count(*)")} AS conv_mil
      FROM fv LEFT JOIN conv USING (user_id)
      GROUP BY 1 ORDER BY bucket"""),
    "View-to-purchase funnel: first-touch attribution within a 7-day " +
      "window, per-bucket conversion in exact millionths; two pruned " +
      "event scans, user-keyed shuffle, no event-by-event join")

  override def defs: Seq[QueryDef] = Seq(cohortRetention, funnelConversion)
}
