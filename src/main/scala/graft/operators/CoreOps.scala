package graft.operators

import graft.{QueryDef, QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core tier — the reference's full data-plane semantics (SURVEY §2.1
  * O1–O15) re-expressed as declarative Spark plans over the `events`
  * fixture, which stands in for the reference's price/hashrate streams
  * (reference: src/mining/utils/load.py:8-55, data_model.py:23-72).
  *
  * Scale posture: every query here is a scan → (pushed) filter → partial
  * agg → shuffle-by-grouping-key → final agg shape. The 5-minute window key
  * is computed per-row, so the only shuffle is the aggregation exchange on
  * (window, event_type) — map-side combine keeps it small. No driver
  * materialization anywhere.
  */
object CoreOps extends QueryPack {

  /** Exact 2-dec decimal view of the double `value` column — both engines
    * round the same IEEE double to the same 2-dec decimal, making sums
    * bit-stable (SURVEY §2.2 determinism rule).
    *
    * Output convention (round-2 fix): all arithmetic stays decimal-exact
    * INTERNALLY, but every decimal column leaves the query as DOUBLE.
    * The driver reads our parquet through pandas (DECIMAL -> Decimal
    * objects, str keeps trailing zeros: '138014.00', NULL -> 'None') but
    * fetches the DuckDB oracle via fetchdf (DECIMAL -> float64:
    * '138014.0', NULL -> 'nan'), so identical values hash-differ unless
    * both sides ship float64. Decimal->double is correctly rounded in
    * both engines and our unscaled values stay < 2^53, so the doubles are
    * bit-identical. Oracle SQL wraps the same decimal expression in
    * CAST(... AS DOUBLE). */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Epoch-seconds start of the 5-minute tumbling window (reference O10:
    * utils/load.py:8-42 computes [spider_ts-300, spider_ts] each tick).
    * Output as BIGINT so the oracle compare never touches timestamp
    * encodings. */
  private def win5m(c: Column): Column =
    unix_timestamp(window(c, "5 minutes").getField("start"))

  /** DuckDB-side equivalent of the 5-minute bucket on a ns timestamp. */
  private val duckWin5m = "CAST(floor(epoch(ts) / 300) AS BIGINT) * 300"

  // ---------------------------------------------------------------- O1: scan
  private val scanParquet = QueryDef(
    "q_scan_parquet",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .select($"l_orderkey", $"l_quantity") // column pruning → ReadSchema shrinks
        .agg(
          count("*").as("n_rows"),
          min($"l_orderkey").as("min_key"),
          max($"l_orderkey").as("max_key"),
          sum(dec($"l_quantity")).cast("decimal(38,2)").cast("double").as("sum_qty"))
    },
    Some("""SELECT count(*) AS n_rows, min(l_orderkey) AS min_key,
      max(l_orderkey) AS max_key,
      CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty
      FROM lineitem"""),
    "Parquet scan + projection + scalar agg; reference O1 source analog")

  // ------------------------------------------------- O3/O4: project+cast
  private val projectCast = QueryDef(
    "q_project_cast",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select(
          $"event_id".as("id"),
          $"user_id".cast("int").as("uid"),
          upper($"event_type").as("etype"),
          dec($"value").cast("double").as("value_dec"),
          unix_timestamp($"ts").as("server_ts"))
        .orderBy($"id")
    },
    Some("""SELECT event_id AS id, CAST(user_id AS INT) AS uid,
      upper(event_type) AS etype,
      CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value_dec,
      CAST(floor(epoch(ts)) AS BIGINT) AS server_ts
      FROM events ORDER BY id"""),
    "Reference O3/O4 projection+rename+cast (utils/transform.py:12-27)")

  // ---------------------------------------------------- O7: BETWEEN filter
  private val filterBetween = QueryDef(
    "q_filter_between",
    (s, d) => {
      import s.implicits._
      // The range predicate must reach PushedFilters in EVERY fixture
      // vintage — at 100 TB that's the difference between scanning a week
      // and scanning the full history. With the nanos-vintage corpus the
      // semantic BETWEEN sits behind a timestamp_micros(div) call —
      // function-wrapped, hence NOT pushable — so a redundant raw-nanos
      // range goes first in bare attribute-vs-literal shape ([lo, hi] =
      // the µs-truncation preimage, admitting exactly the rows the
      // BETWEEN keeps). With the µs-NTZ vintage the stored column IS the
      // semantic column, so the BETWEEN itself is applied pre-normalize
      // and pushes down directly.
      val raw = Tables.rawEvents(s, d)
      val pushed = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          val loNs = 1704412800000000000L // 2024-01-05 00:00:00 UTC, epoch-ns
          val hiNs = 1705017600000000999L // 2024-01-12 00:00:00 UTC + 999 ns
          raw.filter($"ts" >= loNs && $"ts" <= hiNs)
        case tsType =>
          raw.filter($"ts".between(
            lit("2024-01-05 00:00:00").cast(tsType),
            lit("2024-01-12 00:00:00").cast(tsType)))
      }
      Tables.normalizeTs(pushed)
        .filter($"ts".between(lit("2024-01-05 00:00:00"), lit("2024-01-12 00:00:00")))
        .select($"event_id", $"user_id", $"event_type",
          unix_timestamp($"ts").as("ts_sec"))
        .orderBy($"event_id")
    },
    Some("""SELECT event_id, user_id, event_type,
      CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
      FROM events
      WHERE ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-12 00:00:00'
      ORDER BY event_id"""),
    "Reference O7 closed time-range predicate (data_model.py:29-30,55-56)")

  // -------------------------------------------- compound predicate filter
  private val filterPred = QueryDef(
    "q_filter_pred",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter(
          ($"l_returnflag" === "A" || $"l_returnflag" === "R") &&
          $"l_quantity".between(10, 40) &&
          $"l_linestatus".isin("F", "O") &&
          $"l_shipdate".isNotNull &&
          !($"l_discount" > 0.08))
        .select($"l_orderkey", $"l_linenumber", $"l_returnflag",
          dec($"l_quantity").cast("double").as("qty"))
        // (l_orderkey, l_linenumber) is NOT unique in the fixture — order by
        // every output column for a total order (dup rows compare equal).
        .orderBy($"l_orderkey", $"l_linenumber", $"l_returnflag", $"qty")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_returnflag,
      CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS qty
      FROM lineitem
      WHERE (l_returnflag = 'A' OR l_returnflag = 'R')
        AND l_quantity BETWEEN 10 AND 40
        AND l_linestatus IN ('F','O')
        AND l_shipdate IS NOT NULL
        AND NOT (l_discount > 0.08)
      ORDER BY l_orderkey, l_linenumber, l_returnflag, qty"""),
    "Compound boolean predicates (AND/OR/IN/IS NULL/NOT) pushed to scan")

  // ------------------------------------- O8/O9/O10: 5-min tumbling window avg
  private def windowAvg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .groupBy(window($"ts", "5 minutes"), $"event_type")
      .agg(
        count("*").as("n_events"),
        sum(dec($"value")).cast("decimal(38,2)").as("sum_dec"))
      .select(
        unix_timestamp($"window.start").as("win_start"),
        $"event_type", $"n_events",
        $"sum_dec".cast("double").as("sum_value"),
        round($"sum_dec" / $"n_events", 6).cast("decimal(38,6)")
          .cast("double").as("avg_value"))
      .orderBy($"win_start", $"event_type")
  }

  private val aggAvgWindow5m = QueryDef(
    "q_agg_avg_window5m",
    (s, d) => windowAvg(s, d),
    Some(s"""SELECT $duckWin5m AS win_start, event_type,
      count(*) AS n_events,
      CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_value,
      CAST(CAST(round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) / count(*), 6) AS DECIMAL(38,6)) AS DOUBLE) AS avg_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""),
    "Reference O8-O10: 5-min tumbling avg (utils/load.py:8-42)")

  // --------------------------------------------- O11: missing-window fallback
  // Reference: if the current 5-min window has no price rows, fall back to
  // the previous window's average; error only if both miss (load.py:16-25).
  // Engine form: dense window spine (sequence) left-joined to the per-window
  // agg, then last non-null preceding value via an ordered window. The spine
  // is one row per 5 minutes — ~105k rows/year — so the single-partition
  // ordered window over the spine is bounded and cheap even at 100 TB of
  // underlying events; the heavy lifting (the agg) is fully distributed.
  private val windowFallback = QueryDef(
    "q_window_fallback",
    (s, d) => {
      import s.implicits._
      val agg = Tables.events(s, d)
        .filter($"event_type" === "purchase")
        .groupBy(window($"ts", "5 minutes"))
        .agg(sum(dec($"value")).cast("decimal(38,2)").as("sum_v"),
             count("*").as("n_v"))
        .select(unix_timestamp($"window.start").as("win_start"),
          round($"sum_v" / $"n_v", 6).cast("decimal(38,6)").as("avg_v"))
      val bounds = Tables.events(s, d)
        .select(unix_timestamp(window($"ts", "5 minutes").getField("start")).as("w"))
        .agg(min($"w").as("mn"), max($"w").as("mx"))
      val spine = bounds.select(explode(sequence($"mn", $"mx", lit(300L))).as("win_start"))
      val prevW = Window.orderBy($"win_start").rowsBetween(Window.unboundedPreceding, -1)
      spine.join(agg, Seq("win_start"), "left")
        .withColumn("avg_filled",
          coalesce($"avg_v", last($"avg_v", ignoreNulls = true).over(prevW))
            .cast("decimal(38,6)"))
        .select($"win_start",
          $"avg_v".cast("double").as("avg_v"),
          $"avg_filled".cast("double").as("avg_filled"))
        .orderBy($"win_start")
    },
    Some(s"""WITH agg AS (
        SELECT $duckWin5m AS win_start,
          CAST(round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) / count(*), 6) AS DECIMAL(38,6)) AS avg_v
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      bounds AS (SELECT min($duckWin5m) AS mn, max($duckWin5m) AS mx FROM events),
      spine AS (SELECT unnest(generate_series(mn, mx, 300)) AS win_start FROM bounds)
      SELECT s.win_start, CAST(a.avg_v AS DOUBLE) AS avg_v,
        CAST(CAST(coalesce(a.avg_v,
          last_value(a.avg_v IGNORE NULLS) OVER
            (ORDER BY s.win_start ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
          AS DECIMAL(38,6)) AS DOUBLE) AS avg_filled
      FROM spine s LEFT JOIN agg a USING (win_start)
      ORDER BY s.win_start"""),
    "Reference O11 previous-window fallback (utils/load.py:16-25)")

  // ----------------------------------------------------- O2: throttle/dedup
  // Reference gates fetches to one per interval via shared mutable state
  // (main.py:79-98). Batch analog: keep the FIRST event per
  // (user_id, minute bucket). row_number over a composite key is a single
  // shuffle on (user_id, bucket) — no global sort, scales linearly.
  private val throttleDedup = QueryDef(
    "q_throttle_dedup",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id", $"minute_bucket")
        .orderBy($"ts_us", $"event_id")
      Tables.events(s, d)
        .withColumn("minute_bucket", (floor(unix_timestamp($"ts") / 60) * 60).cast("long"))
        .withColumn("ts_us", unix_micros($"ts"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"minute_bucket", $"event_id", $"event_type")
        .orderBy($"user_id", $"minute_bucket")
    },
    Some("""SELECT user_id, minute_bucket, event_id, event_type FROM (
        SELECT user_id,
          CAST(floor(epoch(ts) / 60) AS BIGINT) * 60 AS minute_bucket,
          event_id, event_type,
          row_number() OVER (
            PARTITION BY user_id, CAST(floor(epoch(ts) / 60) AS BIGINT) * 60
            ORDER BY epoch_us(ts), event_id) AS rn
        FROM events) WHERE rn = 1
      ORDER BY user_id, minute_bucket"""),
    "Reference O2 interval gate as first-per-(key,bucket) (main.py:79-98)")

  // ------------------------------------ O12: combine two streams at win grain
  // The reference assembles one wide row from the price avg and the
  // hashrate avg of the same 5-min window (load.py:37-42) — an inner join
  // of two windowed aggregations on the window key.
  private def streamCombine(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def side(et: String, alias: String): DataFrame =
      Tables.events(s, d)
        .filter($"event_type" === et)
        .groupBy(window($"ts", "5 minutes"))
        .agg(sum(dec($"value")).cast("decimal(38,2)").as("sv"),
             count("*").as("nv"))
        .select(unix_timestamp($"window.start").as("win_start"),
          round($"sv" / $"nv", 6).cast("decimal(38,6)").as(alias))
    side("purchase", "avg_purchase")
      .join(side("view", "avg_view"), Seq("win_start"), "inner")
      .select($"win_start",
        $"avg_purchase".cast("double").as("avg_purchase"),
        $"avg_view".cast("double").as("avg_view"))
      .orderBy($"win_start")
  }

  private val streamCombineDef = QueryDef(
    "q_stream_combine",
    (s, d) => streamCombine(s, d),
    Some(s"""WITH p AS (
        SELECT $duckWin5m AS win_start,
          CAST(round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) / count(*), 6) AS DECIMAL(38,6)) AS avg_purchase
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      v AS (
        SELECT $duckWin5m AS win_start,
          CAST(round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) / count(*), 6) AS DECIMAL(38,6)) AS avg_view
        FROM events WHERE event_type = 'view' GROUP BY 1)
      SELECT win_start, CAST(avg_purchase AS DOUBLE) AS avg_purchase,
        CAST(avg_view AS DOUBLE) AS avg_view
      FROM p JOIN v USING (win_start) ORDER BY win_start"""),
    "Reference O12 window-grain stream combine (utils/load.py:37-42)")

  // ------------------------------------------------ O13: round / format
  private val roundFormat = QueryDef(
    "q_round_format",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"event_type")
        .agg(sum(dec($"value")).cast("decimal(38,2)").as("sum_v"),
             count("*").as("n_v"))
        .select(
          $"event_type",
          round($"sum_v" / $"n_v", 2).cast("decimal(38,2)")
            .cast("double").as("avg_rounded"),
          format_string("%.2f", ($"sum_v" / $"n_v").cast("double")).as("avg_str"))
        .orderBy($"event_type")
    },
    Some("""SELECT event_type,
      CAST(CAST(round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) / count(*), 2) AS DECIMAL(38,2)) AS DOUBLE) AS avg_rounded,
      printf('%.2f', CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) / count(*) AS DOUBLE)) AS avg_str
      FROM events GROUP BY event_type ORDER BY event_type"""),
    "Reference O13 fixed-point formatting (utils/load.py:52-53)")

  /** The flagship §7.1 slice: the whole reference pipeline as one plan. */
  def flagship(s: SparkSession, d: String): DataFrame = streamCombine(s, d)

  override def defs: Seq[QueryDef] = Seq(
    scanParquet, projectCast, filterBetween, filterPred,
    aggAvgWindow5m, windowFallback, throttleDedup, streamCombineDef,
    roundFormat)
}
