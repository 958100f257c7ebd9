package graft.operators

import graft.{QueryDef, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregation family (SURVEY §2.2 ext tier) — generalizes the reference's
  * two avg strategies (O8 pushed-down, O9 client-side; utils/load.py:13-35)
  * into the full grouped-aggregation surface.
  *
  * Scale posture: all of these are partial-agg → exchange-on-group-key →
  * final-agg; map-side combine bounds shuffle volume by group cardinality,
  * not input rows. Distinct-heavy ops use approx_count_distinct at scale
  * (exact countDistinct declared too, as a correctness op).
  */
object AggOps extends QueryPack {

  private def dec(cn: String) = col(cn).cast("decimal(18,2)")

  // --------------------------------------------- TPC-H Q1-style group-by
  private val aggGroupBy = QueryDef(
    "q_agg_groupby",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" <= lit("1998-09-02"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum(dec("l_quantity")).cast("decimal(38,2)").cast("double").as("sum_qty"),
          sum(dec("l_extendedprice")).cast("decimal(38,2)").cast("double").as("sum_base_price"),
          sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
            .cast("decimal(38,4)").cast("double").as("sum_disc_price"),
          count("*").as("count_order"),
          round(sum(dec("l_quantity")) / count("*"), 6)
            .cast("decimal(38,6)").cast("double").as("avg_qty"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
      CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_base_price,
      CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
      count(*) AS count_order,
      CAST(CAST(round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) / count(*), 6) AS DECIMAL(38,6)) AS DOUBLE) AS avg_qty
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    "TPC-H Q1-style multi-aggregate group-by with decimal-exact arithmetic")

  // ------------------------------------------------- exact distinct ops
  private val aggDistinct = QueryDef(
    "q_agg_distinct",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_orderkey").as("n_orders"),
          countDistinct($"l_suppkey").as("n_supps"),
          count("*").as("n_rows"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
      count(DISTINCT l_orderkey) AS n_orders,
      count(DISTINCT l_suppkey) AS n_supps,
      count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    "Exact multi-column countDistinct (expand + two-phase agg)")

  // ------------------------------------------ dropDuplicates as a query
  private val aggDropDup = QueryDef(
    "q_agg_dropdup",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .select($"o_custkey", $"o_orderstatus")
        .dropDuplicates("o_custkey", "o_orderstatus")
        .orderBy($"o_custkey", $"o_orderstatus")
    },
    Some("""SELECT DISTINCT o_custkey, o_orderstatus FROM orders
      ORDER BY o_custkey, o_orderstatus"""),
    "dropDuplicates = shuffle-on-key distinct")

  // ------------------------------------------------------ HLL approx
  // No DuckDB oracle (algorithm-specific); spec checks the estimate
  // against the exact count within HLL's published error bound.
  private val aggHll = QueryDef(
    "q_agg_hll",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"event_type")
        .agg(
          approx_count_distinct($"user_id", 0.02).as("approx_users"),
          count("*").as("n_events"))
        .orderBy($"event_type")
    },
    None,
    "HyperLogLog++ distinct: constant memory per group at any scale")

  // ------------------------------------- re-aggregatable sketch rollup
  // The incremental-aggregation pattern a 100 TB warehouse lives on:
  // materialize a BOUNDED DataSketches HLL partial per day
  // (hll_sketch_agg), then answer the month/total question by UNIONING
  // the partials (hll_union_agg) — never re-scanning raw events. A plain
  // approx_count_distinct result is a NUMBER and cannot be re-aggregated
  // (distincts don't add); the sketch column is what makes rollup,
  // backfill, and late-partition merge O(partials) instead of O(raw).
  // Estimates are a pure function of the input value SET (register-wise
  // max is commutative), so any partitioning/merge order yields the
  // same declared output. No DuckDB oracle (DataSketches-specific);
  // q_agg_sketch_rollup_audit pins the error/consistency invariants
  // against the exact recompute.
  private[graft] val SketchLgK = 12
  private[graft] def dailySketches(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select(to_date($"ts").as("day"), $"user_id")
      .groupBy($"day")
      .agg(hll_sketch_agg($"user_id", lit(SketchLgK)).as("sk"),
        count(lit(1)).as("n_events"))
  }
  private val aggSketchRollup = QueryDef(
    "q_agg_sketch_rollup",
    (s, d) => {
      import s.implicits._
      // cached: `daily` feeds two plan branches (perDay + the unioned
      // total) — without it the raw-events scan and the HLL sketch
      // aggregation run twice, at odds with the op's own "never re-scan
      // raw events" framing (ADVICE r8)
      val daily = dailySketches(s, d).cache()
      val perDay = daily.select(
        date_format($"day", "yyyy-MM-dd").as("day"),
        $"n_events",
        hll_sketch_estimate($"sk").as("est_users"))
      // the rollup: union the per-day partials, never the raw events
      val total = daily.agg(
        sum($"n_events").as("n_events"),
        hll_sketch_estimate(hll_union_agg($"sk", lit(false))).as("est_users"))
        .select(lit("total").as("day"), $"n_events", $"est_users")
      perDay.unionByName(total).orderBy($"day")
    },
    None,
    "Re-aggregatable distinct: daily DataSketches HLL partials unioned " +
      "into the total without re-scanning raw events")

  // -------------------------------------------------- rollup + grouping
  private val rollupCube = QueryDef(
    "q_rollup_cube",
    (s, d) => {
      import s.implicits._
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .rollup($"r_name", $"n_name")
        .agg(count("*").as("n_cust"),
          sum(dec("c_acctbal")).cast("decimal(38,2)").cast("double").as("sum_bal"),
          grouping_id().as("gid"))
        .select(
          coalesce($"r_name", lit("ALL")).as("region"),
          coalesce($"n_name", lit("ALL")).as("nation"),
          $"n_cust", $"sum_bal", $"gid")
        .orderBy($"gid", $"region", $"nation")
    },
    Some("""SELECT coalesce(r_name, 'ALL') AS region,
      coalesce(n_name, 'ALL') AS nation,
      count(*) AS n_cust,
      CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_bal,
      CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)
      ORDER BY gid, region, nation"""),
    "Grouping sets via rollup + grouping_id over the dim hierarchy")

  // ------------------------------------------- explicit grouping sets
  // The irregular-set form rollup/cube can't express: aggregate at
  // (priority, status), at (status) alone — skipping the (priority)
  // level a rollup would force — and the grand total. One pass over the
  // data (Spark expands sets map-side, same partial-agg → exchange shape
  // as a plain group-by); gid disambiguates levels without relying on
  // NULL sentinels.
  private val aggGroupingSets = QueryDef(
    "q_agg_grouping_sets",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .groupingSets(
          Seq(Seq($"o_orderpriority", $"o_orderstatus"),
            Seq($"o_orderstatus"), Seq()),
          $"o_orderpriority", $"o_orderstatus")
        .agg(count("*").as("n"),
          sum(dec("o_totalprice")).cast("decimal(38,2)").cast("double")
            .as("revenue"),
          grouping_id().as("gid"))
        .select(
          coalesce($"o_orderpriority", lit("ALL")).as("priority"),
          coalesce($"o_orderstatus", lit("ALL")).as("status"),
          $"n", $"revenue", $"gid")
        .orderBy($"gid", $"priority", $"status")
    },
    Some("""SELECT coalesce(o_orderpriority, 'ALL') AS priority,
      coalesce(o_orderstatus, 'ALL') AS status,
      count(*) AS n,
      CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS revenue,
      CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid
      FROM orders
      GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
        (o_orderstatus), ())
      ORDER BY gid, priority, status"""),
    "Irregular GROUPING SETS (skips a rollup level) + grouping_id")

  // -------------------------------------------- salted two-phase agg
  // The skew lever, demonstrated with a correctness proof: phase 1
  // aggregates on (key, salt) — a hot key's rows spread over 16 reducers —
  // phase 2 merges the partials on the key alone. Identical result to the
  // direct group-by (the oracle is the direct formulation), ~2x the
  // exchanges; flip it on per-key when AQE's skew stats flag a hot key.
  private val saltedAgg = QueryDef(
    "q_salted_agg",
    (s, d) => {
      import s.implicits._
      val salted = Tables.lineitem(s, d)
        .withColumn("salt", pmod(xxhash64($"l_orderkey", $"l_linenumber"), lit(16)))
        .groupBy($"l_returnflag", $"salt")
        .agg(count("*").as("pn"),
          sum(dec("l_quantity")).as("ps"))
      salted.groupBy($"l_returnflag")
        .agg(sum($"pn").as("n_rows"),
          sum($"ps").cast("decimal(38,2)").cast("double").as("sum_qty"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag, count(*) AS n_rows,
      CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    "Skew-salted two-phase aggregation, provably equal to the direct form")

  // ------------------------------------------ percentiles + arg-extremes
  private val aggPercentile = QueryDef(
    "q_agg_percentile",
    (s, d) => {
      import s.implicits._
      // unique sortable value makes min_by/max_by tie-free across engines
      val ordv = datediff($"l_shipdate".cast("date"), lit("1990-01-01").cast("date"))
        .cast("long") * 10000000L + $"l_orderkey" * 10L + $"l_linenumber"
      Tables.lineitem(s, d)
        .withColumn("ordv", ordv)
        .groupBy($"l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 6).cast("decimal(38,6)")
            .cast("double").as("p50_qty"),
          round(expr("percentile(l_quantity, 0.9)"), 6).cast("decimal(38,6)")
            .cast("double").as("p90_qty"),
          min_by($"l_orderkey", $"ordv").as("first_ship_order"),
          max_by($"l_orderkey", $"ordv").as("last_ship_order"))
        .orderBy($"l_returnflag")
    },
    Some("""WITH t AS (
        SELECT *, CAST(datediff('day', DATE '1990-01-01', CAST(l_shipdate AS DATE)) AS BIGINT)
          * 10000000 + l_orderkey * 10 + l_linenumber AS ordv
        FROM lineitem)
      SELECT l_returnflag,
        CAST(CAST(round(quantile_cont(l_quantity, 0.5), 6) AS DECIMAL(38,6)) AS DOUBLE) AS p50_qty,
        CAST(CAST(round(quantile_cont(l_quantity, 0.9), 6) AS DECIMAL(38,6)) AS DOUBLE) AS p90_qty,
        min_by(l_orderkey, ordv) AS first_ship_order,
        max_by(l_orderkey, ordv) AS last_ship_order
      FROM t GROUP BY l_returnflag ORDER BY l_returnflag"""),
    "Exact interpolated percentiles + tie-free min_by/max_by")

  // -------------------------------------- approximate percentiles
  // The scale path for q_agg_percentile: exact percentile needs the full
  // per-group value multiset (a sort-by-group at 100 TB); approx_percentile
  // keeps a fixed-size Greenwald-Khanna sketch per group (mergeable, so
  // partial-agg → exchange still applies) with rank error ≤ n/accuracy.
  // No DuckDB oracle (sketch-algorithm-specific, like q_agg_hll); the spec
  // brackets each estimate between the exact values at rank ± n/accuracy.
  // The multi-quantile form still evaluates ONE shared sketch per group
  // (Catalyst plans one ApproximatePercentile buffer for the array call),
  // but the declared columns are scalars — the driver's pandas compare
  // cannot hash nested cells, so the array is unpacked via element_at.
  private val aggPercentileApprox = QueryDef(
    "q_agg_percentile_approx",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          expr("approx_percentile(l_quantity, 0.5, 10000)").as("p50_qty"),
          expr("approx_percentile(l_quantity, 0.9, 10000)").as("p90_qty"),
          expr("approx_percentile(l_quantity, array(0.25, 0.75), 10000)")
            .as("iqr"),
          count("*").as("n_rows"))
        .select(
          $"l_returnflag", $"p50_qty", $"p90_qty",
          element_at($"iqr", 1).as("p25_qty"),
          element_at($"iqr", 2).as("p75_qty"),
          $"n_rows")
        .orderBy($"l_returnflag")
    },
    None,
    "GK-sketch percentiles: bounded memory per group at any scale")

  // ----------------------------------------- collection aggregates
  // collect_set / collect_list surface. Collection order is engine- and
  // partition-dependent, so both sides sort before rendering (sort_array
  // + array_join) — the canonical way to make a collection aggregate
  // deterministic enough to compare across engines.
  private val aggCollect = QueryDef(
    "q_agg_collect",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .groupBy($"o_orderpriority")
        .agg(
          array_join(array_sort(collect_set($"o_orderstatus")), ",")
            .as("statuses"),
          count("*").as("n"),
          array_join(array_sort(collect_set(year($"o_orderdate").cast("string"))), ",")
            .as("years"))
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
      array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses,
      count(*) AS n,
      array_to_string(list_sort(list_distinct(list(CAST(year(o_orderdate) AS VARCHAR)))), ',') AS years
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    "collect_set aggregates rendered order-stably (sort + join)")

  // ------------------------------------------- statistical aggregates
  // Sample variance / stddev from exact decimal moments: sum and sum of
  // squares accumulate exactly (scale 4 products) and stay well inside 38
  // digits (no decimal×decimal products — DuckDB silently promotes an
  // over-wide decimal product to DOUBLE, which diverges past 2^53). The
  // variance formula then runs entirely in DOUBLE with the IDENTICAL
  // operation tree on both sides: the exact moments convert to the same
  // doubles, and every subsequent *, -, / is a deterministic IEEE 754 op —
  // bit-stable at any group size, unlike decimal division whose rounding
  // rules differ between engines.
  private val aggStats = QueryDef(
    "q_agg_stats",
    (s, d) => {
      import s.implicits._
      val q = dec("l_quantity")
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          count("*").as("n"),
          sum(q).cast("decimal(38,2)").as("s1"),
          sum((q * q).cast("decimal(18,4)")).cast("decimal(38,4)").as("s2"))
        .select(
          $"l_returnflag", $"n",
          (($"s2".cast("double") * $"n".cast("double") -
            $"s1".cast("double") * $"s1".cast("double")) /
            ($"n".cast("double") * ($"n".cast("double") - lit(1.0))))
            .as("var_qty"))
        .withColumn("stddev_qty", sqrt($"var_qty"))
        .orderBy($"l_returnflag")
    },
    Some("""WITH m AS (
        SELECT l_returnflag, count(*) AS n,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s1,
          CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS s2
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n,
        (CAST(s2 AS DOUBLE) * CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS var_qty,
        sqrt((CAST(s2 AS DOUBLE) * CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS stddev_qty
      FROM m ORDER BY l_returnflag"""),
    "Sample variance/stddev from exact decimal moments, combined in IEEE double")

  // ------------------------------------------------------- full cube
  // True CUBE (all 2^k grouping sets, vs rollup's k+1 prefixes) over the
  // two independent dims; grouping_id disambiguates the NULL-vs-'ALL'
  // levels exactly as in q_rollup_cube.
  private val aggCube = QueryDef(
    "q_agg_cube",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count("*").as("n"),
          sum(dec("o_totalprice")).cast("decimal(38,2)").cast("double").as("revenue"),
          grouping_id().as("gid"))
        .select(
          coalesce($"o_orderstatus", lit("ALL")).as("status"),
          coalesce($"o_orderpriority", lit("ALL")).as("priority"),
          $"n", $"revenue", $"gid")
        .orderBy($"gid", $"status", $"priority")
    },
    Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
      coalesce(o_orderpriority, 'ALL') AS priority,
      count(*) AS n,
      CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS revenue,
      CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY gid, status, priority"""),
    "Full CUBE grouping sets (2^k combinations) + grouping_id")

  // -------------------------------------------------- sliding windows
  // Overlapping 10-minute windows sliding by 5: every event lands in
  // exactly two windows. The oracle unions the two shifted bucket
  // assignments — the generic SQL formulation of a sliding window.
  private val aggSliding = QueryDef(
    "q_agg_sliding_window",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy(window($"ts", "10 minutes", "5 minutes"), $"event_type")
        .agg(count("*").as("n_events"),
          sum(dec("value")).cast("decimal(38,2)").cast("double").as("sum_value"))
        .select(unix_timestamp($"window.start").as("win_start"),
          $"event_type", $"n_events", $"sum_value")
        .orderBy($"win_start", $"event_type")
    },
    Some("""WITH assigned AS (
        SELECT CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 - s.shift AS win_start,
          event_type, value
        FROM events, (SELECT unnest([0, 300]) AS shift) s)
      SELECT win_start, event_type, count(*) AS n_events,
        CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_value
      FROM assigned GROUP BY win_start, event_type
      ORDER BY win_start, event_type"""),
    "Sliding (overlapping) windows: 10-min size, 5-min slide")

  override def defs: Seq[QueryDef] =
    Seq(aggGroupBy, aggDistinct, aggDropDup, aggHll, aggSketchRollup,
      rollupCube,
      aggGroupingSets, saltedAgg, aggPercentile, aggPercentileApprox,
      aggCollect, aggStats, aggCube, aggSliding)
}
