package graft.operators

import graft.{QueryDef, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic window functions (SURVEY §2.2 ext tier). Absent from the
  * reference (SURVEY §2.1 "notably absent"), but its O11 fallback is
  * lag-shaped, so the family is a natural generalization.
  *
  * Scale posture: every window here is partitioned by a key (customer),
  * so state is bounded per partition and the only shuffle is the exchange
  * on the partition key; no global sorts.
  */
object WindowFuncOps extends QueryPack {

  private def dec(cn: String) = col(cn).cast("decimal(18,2)")

  // ------------------------------------------- ranking + lag/lead
  private val winRank = QueryDef(
    "q_winfunc_rank",
    (s, d) => {
      import s.implicits._
      // total per-customer order: totalprice can tie, orderkey breaks it
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      Tables.orders(s, d)
        .select(
          $"o_custkey", $"o_orderkey",
          dec("o_totalprice").cast("double").as("price"),
          rank().over(w).cast("long").as("rnk"),      // bigint: match DuckDB rank()
          row_number().over(w).cast("long").as("rn"),
          lag(dec("o_totalprice"), 1).over(w).cast("double").as("prev_price"),
          lead(dec("o_totalprice"), 1).over(w).cast("double").as("next_price"))
        .filter($"rn" <= 3)
        .orderBy($"o_custkey", $"rn")
    },
    Some("""SELECT o_custkey, o_orderkey, price, rnk, rn, prev_price, next_price
      FROM (
        SELECT o_custkey, o_orderkey,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
          rank() OVER w AS rnk,
          row_number() OVER w AS rn,
          CAST(lag(CAST(o_totalprice AS DECIMAL(18,2)), 1) OVER w AS DOUBLE) AS prev_price,
          CAST(lead(CAST(o_totalprice AS DECIMAL(18,2)), 1) OVER w AS DOUBLE) AS next_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey))
      WHERE rn <= 3 ORDER BY o_custkey, rn"""),
    "Top-3 orders per customer: rank/row_number/lag/lead over one window")

  // ------------------------------------------------ running-sum frame
  private val winFrame = QueryDef(
    "q_winfunc_frame",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(
          $"o_custkey", $"o_orderkey",
          sum(dec("o_totalprice")).over(w).cast("decimal(38,2)")
            .cast("double").as("running_spend"),
          count("*").over(w).as("running_orders"))
        .orderBy($"o_custkey", $"o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
      CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DECIMAL(38,2)) AS DOUBLE) AS running_spend,
      count(*) OVER w AS running_orders
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderkey"""),
    "Explicit rowsBetween frame: per-customer running totals")

  // -------------------------------------- distribution window functions
  // ntile / percent_rank / cume_dist / first_value / last_value. The
  // ratio functions divide exact ints ((rank-1)/(n-1), k/n) — the same
  // IEEE division in both engines, so the doubles are bit-identical.
  // Window ordered by the unique o_orderkey: tie-free by construction.
  private val winDist = QueryDef(
    "q_winfunc_dist",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderkey")
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select(
          $"o_custkey", $"o_orderkey",
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"),
          dense_rank().over(w).cast("long").as("drnk"),
          first($"o_orderkey").over(wFull).as("first_key"),
          last($"o_orderkey").over(wFull).as("last_key"),
          nth_value($"o_orderkey", 2).over(wFull).as("second_key"))
        .orderBy($"o_custkey", $"o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
      CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      percent_rank() OVER w AS pct_rank,
      cume_dist() OVER w AS cume,
      dense_rank() OVER w AS drnk,
      first_value(o_orderkey) OVER wf AS first_key,
      last_value(o_orderkey) OVER wf AS last_key,
      nth_value(o_orderkey, 2) OVER wf AS second_key
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey),
        wf AS (PARTITION BY o_custkey ORDER BY o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey"""),
    "ntile/percent_rank/cume_dist/dense_rank/first/last/nth_value battery")

  // ------------------------------------------------ RANGE-based frame
  // Value-based frame: per-customer spend over the trailing 30 DAYS
  // (not 30 rows) — RANGE BETWEEN over an integer day ordinal. Ties
  // (same-day orders) all enter the frame together, so the result is
  // tie-order independent by construction.
  private val winRange = QueryDef(
    "q_winfunc_range",
    (s, d) => {
      import s.implicits._
      val dayOrd = datediff($"o_orderdate".cast("date"),
        lit("1990-01-01").cast("date"))
      val w = Window.partitionBy($"o_custkey").orderBy(dayOrd)
        .rangeBetween(-30, Window.currentRow)
      Tables.orders(s, d)
        .select(
          $"o_custkey", $"o_orderkey", dayOrd.as("day_ord"),
          sum(dec("o_totalprice")).over(w).cast("decimal(38,2)")
            .cast("double").as("spend_30d"),
          count("*").over(w).as("n_30d"))
        .orderBy($"o_custkey", $"o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
      CAST(datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS INT) AS day_ord,
      CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DECIMAL(38,2)) AS DOUBLE) AS spend_30d,
      count(*) OVER w AS n_30d
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
        ORDER BY datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
        RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderkey"""),
    "RANGE frame: trailing-30-day per-customer spend (value-based window)")

  override def defs: Seq[QueryDef] = Seq(winRank, winFrame, winDist, winRange)
}
