package graft.operators

import graft.{QueryDef, QueryPack, Tables}
import org.apache.spark.sql.functions._

/** Per-user stats produced by the typed grouped-map path. */
case class UserStats(user_id: Long, n_events: Long, sum_value: BigDecimal)

/** Typed-API and reshaping operators: pivot (the reference's O12 wide-row
  * assembly as a first-class reshape) and KeyValueGroupedDataset.mapGroups
  * (the typed escape hatch for per-group logic no built-in agg covers).
  */
object TypedOps extends QueryPack {

  // ----------------------------------------------------------- pivot
  // O12 (utils/load.py:37-42) assembles one wide row per window from
  // per-stream aggregates; `pivot` with an EXPLICIT value list is the
  // idiomatic form — explicit values keep planning single-pass (no
  // distinct-scan) and make the output schema static, which is what you
  // want at 100 TB.
  private val pivotWide = QueryDef(
    "q_pivot_wide",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy(unix_timestamp(window($"ts", "5 minutes").getField("start"))
          .as("win_start"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .select($"win_start",
          coalesce($"click", lit(0L)).as("n_click"),
          coalesce($"error", lit(0L)).as("n_error"),
          coalesce($"purchase", lit(0L)).as("n_purchase"),
          coalesce($"signup", lit(0L)).as("n_signup"),
          coalesce($"view", lit(0L)).as("n_view"))
        .orderBy($"win_start")
    },
    Some("""SELECT CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 AS win_start,
      count(*) FILTER (WHERE event_type = 'click') AS n_click,
      count(*) FILTER (WHERE event_type = 'error') AS n_error,
      count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
      count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
      count(*) FILTER (WHERE event_type = 'view') AS n_view
      FROM events GROUP BY 1 ORDER BY 1"""),
    "Pivot with explicit values: O12's wide row as a reshape operator")

  // ----------------------------------------------- typed grouped map
  // mapGroups streams each group's iterator (constant memory per group);
  // the shuffle is the groupByKey exchange on user_id. Used when per-group
  // logic genuinely can't be an aggregate expression — here it recomputes
  // a decimal sum to stay oracle-checkable.
  private val groupedMap = QueryDef(
    "q_grouped_map",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select($"user_id", $"value").as[(Long, Double)]
        .groupByKey(_._1)
        .mapGroups { (uid, it) =>
          var n = 0L
          var sum = BigDecimal(0)
          it.foreach { case (_, v) =>
            n += 1
            sum += BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          }
          UserStats(uid, n, sum)
        }
        .toDF()
        .select($"user_id", $"n_events",
          $"sum_value".cast("decimal(38,2)").cast("double").as("sum_value"))
        .orderBy($"user_id")
    },
    Some("""SELECT user_id, count(*) AS n_events,
      CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_value
      FROM events GROUP BY user_id ORDER BY user_id"""),
    "KeyValueGroupedDataset.mapGroups: typed per-group computation")

  // --------------------------------------------------------- unpivot
  // pivot's inverse (melt): wide customer metrics to long (metric, value)
  // rows — a narrow per-row generator, no shuffle besides the sort.
  private val unpivotLong = QueryDef(
    "q_unpivot",
    (s, d) => {
      import s.implicits._
      Tables.customer(s, d)
        .select($"c_custkey",
          $"c_acctbal".cast("decimal(18,2)").as("acctbal"),
          $"c_nationkey".cast("decimal(18,2)").as("nationkey"))
        .unpivot(Array($"c_custkey"), Array($"acctbal", $"nationkey"),
          "metric", "value")
        .select($"c_custkey", $"metric",
          $"value".cast("decimal(38,2)").cast("double").as("value"))
        .orderBy($"c_custkey", $"metric")
    },
    Some("""SELECT c_custkey, 'acctbal' AS metric,
        CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS value FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey' AS metric,
        CAST(CAST(c_nationkey AS DECIMAL(18,2)) AS DOUBLE) AS value FROM customer
      ORDER BY c_custkey, metric"""),
    "unpivot/melt: wide metrics to long rows")

  override def defs: Seq[QueryDef] = Seq(pivotWide, groupedMap, unpivotLong)
}
