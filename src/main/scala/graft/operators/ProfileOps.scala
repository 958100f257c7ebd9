package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, QueryPack, Tables}

/** Table profiling — the ANALYZE/summarize pass every lake pipeline runs
  * before trusting a new drop of data: per-column null counts, exact
  * distinct cardinalities, and min/max, in ONE pass over the table.
  *
  * Scale shape: a single aggregation; the multiple exact
  * `count(DISTINCT)` columns plan through Catalyst's Expand (one
  * input row → one row per distinct-aggregate), so the whole profile is
  * one shuffle whose volume is bounded by Σ per-column cardinalities,
  * not rows × columns. (At 100 TB you would swap exact distincts for
  * `approx_count_distinct` sketches — the declared exact form is what a
  * DuckDB oracle can replay; the plan shape is identical.)
  *
  * Output rendering: every min/max leaves as VARCHAR with an
  * engine-portable exact rendering — BIGINT as-is, DOUBLE through
  * DECIMAL(18,2) (fixed scale keeps trailing zeros identical), and
  * TIMESTAMP as epoch seconds — computed numerically FIRST (a lexical
  * min over rendered strings would order '10' < '9') and rendered after
  * aggregation.
  */
object ProfileOps extends QueryPack {

  /** (column name, numeric min/max expression, post-agg renderer). */
  private def profiled(): Seq[(String, Column => Column)] = Seq(
    "l_orderkey" -> ((c: Column) => c.cast("string")),
    "l_quantity" -> ((c: Column) => c.cast("decimal(18,2)").cast("string")),
    "l_extendedprice" -> ((c: Column) => c.cast("decimal(18,2)").cast("string")),
    "l_returnflag" -> ((c: Column) => c),
    "l_linestatus" -> ((c: Column) => c),
    "l_shipdate" -> ((c: Column) =>
      unix_timestamp(c.cast("timestamp")).cast("string")))

  private val profileTable = QueryDef(
    "q_profile_table",
    (s, d) => {
      import s.implicits._
      val cols = profiled()
      val aggs = cols.flatMap { case (c, _) => Seq(
        count(when(col(c).isNull, 1)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).as(s"${c}__mn"),
        max(col(c)).as(s"${c}__mx"))
      }
      val row = Tables.lineitem(s, d)
        .agg(count(lit(1)).as("n_rows"), aggs: _*)
      val entries = array(cols.map { case (c, render) =>
        struct(lit(c).as("col_name"),
          col(s"${c}__nn").as("n_null"),
          col(s"${c}__nd").as("n_distinct"),
          coalesce(render(col(s"${c}__mn")), lit("")).as("min_s"),
          coalesce(render(col(s"${c}__mx")), lit("")).as("max_s"))
      }: _*)
      row.select($"n_rows", explode(entries).as("e"))
        .select($"e.col_name".as("col_name"), $"n_rows",
          $"e.n_null".as("n_null"), $"e.n_distinct".as("n_distinct"),
          $"e.min_s".as("min_s"), $"e.max_s".as("max_s"))
        .orderBy($"col_name")
    },
    Some {
      val selects = Seq(
        ("l_orderkey", "CAST(%s AS VARCHAR)"),
        ("l_quantity", "CAST(CAST(%s AS DECIMAL(18,2)) AS VARCHAR)"),
        ("l_extendedprice", "CAST(CAST(%s AS DECIMAL(18,2)) AS VARCHAR)"),
        ("l_returnflag", "%s"),
        ("l_linestatus", "%s"),
        ("l_shipdate", "CAST(CAST(epoch(%s) AS BIGINT) AS VARCHAR)")
      ).map { case (c, fmt) =>
        val mn = fmt.format(s"min($c)")
        val mx = fmt.format(s"max($c)")
        s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
          CAST(count(*) - count($c) AS BIGINT) AS n_null,
          CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
          COALESCE($mn, '') AS min_s, COALESCE($mx, '') AS max_s
        FROM lineitem"""
      }
      selects.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    "One-pass table profile: per-column nulls, exact distincts, " +
      "portable-rendered min/max (Expand-planned multi-distinct)")

  // ---------------------------------------------------- q_profile_drift
  /** Categorical dimensions monitored for drift. */
  private[graft] val DriftDims = Seq("lang", "source")

  // Snapshot drift monitor — the check a training pipeline runs before
  // trusting a new corpus drop: compare each categorical dimension's
  // distribution between the baseline half and the new half (doc_id
  // parity, the same split the streaming landing zone uses as its
  // batch boundary) and publish per-category share deltas. The distance
  // is total-variation (TVD = Σ|p − q| / 2), chosen over PSI/KL because
  // it is RATIONAL in the counts — exact in integer millionths, so the
  // oracle replays it bit-for-bit (ln has no engine-portable fixed-point
  // form; the same substitution reasoning as the search tier's linear
  // idf). Scale shape: ONE corpus scan (each doc emits one row per
  // monitored dimension via a bounded explode), one category-keyed
  // aggregation, then everything downstream is vocabulary-bounded.
  // NULL metadata coalesces to a sentinel BEFORE grouping so the
  // malformed-metadata case a drift monitor exists for groups AND
  // orders identically in both engines (Spark sorts NULLS FIRST,
  // DuckDB NULLS LAST — a real NULL category would order-diverge).
  private[graft] val NullCategory = "<null>"

  private val profileDrift = QueryDef(
    "q_profile_drift",
    (s, d) => {
      import s.implicits._
      import Exact.mil
      val cats = Tables.documents(s, d)
        .select(($"doc_id" % 2).as("side"),
          explode(array(DriftDims.map(dim =>
            struct(lit(dim).as("dim"),
              coalesce(col(dim), lit(NullCategory)).as("category"))): _*))
            .as("e"))
        .select($"side", $"e.dim".as("dim"), $"e.category".as("category"))
      // vocabulary-bounded from here down — CACHED, because four plan
      // references (two sides × (shares + totals)) would otherwise each
      // re-expand the corpus scan (Catalyst has no common-subtree reuse)
      val counts = cats.groupBy($"side", $"dim", $"category")
        .agg(count(lit(1)).as("n"))
        .cache()
      val totals = counts.groupBy($"side", $"dim").agg(sum($"n").as("n_total"))
      val shares = counts.join(totals, Seq("side", "dim"))
        .select($"side", $"dim", $"category",
          mil($"n", $"n_total").as("share_mil"))
      shares.filter($"side" === 0)
        .select($"dim", $"category", $"share_mil".as("b_mil"))
        .join(shares.filter($"side" === 1)
          .select($"dim", $"category", $"share_mil".as("n_mil")),
          Seq("dim", "category"), "full_outer")
        .select($"dim", $"category",
          coalesce($"b_mil", lit(0L)).as("base_mil"),
          coalesce($"n_mil", lit(0L)).as("new_mil"))
        .withColumn("diff_mil", abs($"base_mil" - $"new_mil"))
        .orderBy($"dim", $"category")
    },
    Some {
      val dims = DriftDims.map { dim =>
        s"""SELECT '$dim' AS dim, coalesce(b.category, n.category) AS category,
          coalesce(b.share_mil, 0) AS base_mil,
          coalesce(n.share_mil, 0) AS new_mil,
          abs(coalesce(b.share_mil, 0) - coalesce(n.share_mil, 0)) AS diff_mil
        FROM (
          SELECT coalesce($dim, '$NullCategory') AS category,
            ${Exact.milSql("count(*)",
              "SELECT count(*) FROM documents WHERE doc_id % 2 = 0")} AS share_mil
          FROM documents WHERE doc_id % 2 = 0 GROUP BY 1) b
        FULL OUTER JOIN (
          SELECT coalesce($dim, '$NullCategory') AS category,
            ${Exact.milSql("count(*)",
              "SELECT count(*) FROM documents WHERE doc_id % 2 = 1")} AS share_mil
          FROM documents WHERE doc_id % 2 = 1 GROUP BY 1) n
        ON b.category = n.category"""
      }
      dims.mkString("", "\nUNION ALL\n", "\nORDER BY dim, category")
    },
    "Snapshot drift monitor: per-category share deltas (exact integer " +
      "millionths) between the baseline and new corpus halves over the " +
      "declared categorical dimensions — TVD = sum(diff_mil)/2 per dim; " +
      "one corpus scan, vocabulary-bounded exchanges")

  // ---------------------------------------------------- q_profile_skew
  // Hot-key diagnostics — the measurement a pipeline owner runs BEFORE
  // choosing a partitioning/salting strategy for a 100 TB shuffle: the
  // top hot keys of a join/agg key column with their exact corpus
  // shares, plus the global concentration statistics that decide
  // whether AQE skew-split suffices or the key needs salting
  // (max-share and the Herfindahl concentration index Σ share², both
  // exact in integer millionths — rational in the counts, the TVD
  // substitution discipline).
  //
  // Scale shape: ONE keyed count aggregation (map-side combined — the
  // shuffle being diagnosed, paid once), then a 1-row global stat
  // aggregate and a TakeOrdered top-N head (per-partition heaps, no
  // global sort, no key-cardinality window); the stats attach to the
  // N-row head by a deliberate 1-row broadcast crossJoin. Nothing
  // beyond the first aggregation scales with the corpus or the key
  // cardinality.
  private[graft] val SkewTopN = 10

  private val profileSkew = QueryDef(
    "q_profile_skew",
    (s, d) => {
      import s.implicits._
      val counts = Tables.events(s, d)
        .groupBy($"user_id").agg(count(lit(1)).as("cnt"))
      val dec = (c: Column) => c.cast("decimal(38,2)")
      // every multiply is widened BEFORE it happens: a raw long*long on
      // counts in the billions (the exact scale this query diagnoses)
      // would silently wrap where the oracle's HUGEINT does not
      val wide = (c: Column) => c.cast("decimal(38,0)")
      val stats = counts.agg(
        count(lit(1)).as("n_keys"),
        sum($"cnt").as("total"),
        max($"cnt").as("max_cnt"),
        sum(wide($"cnt") * wide($"cnt")).as("sumsq"))
        .select($"n_keys", $"total".cast("long").as("n_rows"),
          round(dec(wide($"max_cnt") * 1000000L) / $"total", 0)
            .cast("long").as("max_share_mil"),
          round(dec($"sumsq" * 1000000L) / (wide($"total") * $"total"), 0)
            .cast("long").as("hhi_mil"))
      val top = counts
        .orderBy($"cnt".desc, $"user_id").limit(SkewTopN)
        // bounded-input window: row_number over the SkewTopN-row head
        // (the TextOps token-vocab pattern; plan-sweep allowlisted)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy($"cnt".desc, $"user_id")))
        .select($"rank".cast("long").as("rank"), $"user_id", $"cnt")
      top.crossJoin(broadcast(stats))
        .select($"rank", $"user_id", $"cnt",
          round(dec($"cnt".cast("decimal(38,0)") * 1000000L) / $"n_rows", 0)
            .cast("long").as("share_mil"),
          $"n_keys", $"n_rows", $"max_share_mil", $"hhi_mil")
        .orderBy($"rank")
    },
    Some(s"""WITH c AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY user_id),
      st AS (
        SELECT CAST(count(*) AS BIGINT) AS n_keys,
          CAST(sum(cnt) AS BIGINT) AS n_rows,
          CAST(round(CAST(max(cnt) * 1000000 AS DECIMAL(38,2))
            / sum(cnt), 0) AS BIGINT) AS max_share_mil,
          CAST(round(CAST(sum(CAST(cnt AS HUGEINT) * CAST(cnt AS HUGEINT))
              * 1000000 AS DECIMAL(38,2)) / (sum(cnt) * sum(cnt)), 0)
            AS BIGINT) AS hhi_mil
        FROM c),
      t AS (
        SELECT CAST(row_number() OVER (ORDER BY cnt DESC, user_id)
            AS BIGINT) AS rank, user_id, cnt
        FROM c
        QUALIFY rank <= $SkewTopN)
      SELECT t.rank, t.user_id, t.cnt,
        CAST(round(CAST(t.cnt * 1000000 AS DECIMAL(38,2)) / st.n_rows, 0)
          AS BIGINT) AS share_mil,
        st.n_keys, st.n_rows, st.max_share_mil, st.hhi_mil
      FROM t CROSS JOIN st
      ORDER BY t.rank"""),
    s"Hot-key skew diagnostics: top-$SkewTopN keys with exact millionth " +
      "shares + global concentration stats (max share, Herfindahl) — " +
      "one keyed count, a 1-row stat attach, a TakeOrdered head")

  // ---------------------------------------------------- q_expectations
  // The Deequ-class constraint gate (VERDICT r11 task 7): the declared
  // per-column expectations a lake pipeline runs on every drop before
  // admitting it — completeness (NOT NULL), key uniqueness, numeric
  // range, categorical domain, and referential integrity against a
  // dimension — evaluated in ONE fact scan. Output is one row per
  // declared constraint (vocabulary-bounded), each with its violation
  // count and pass flag, fully hash-oracle-able.
  //
  // Scale shape: the row-local checks are map-side conditional sums; the
  // uniqueness check is the same Expand-planned exact distinct
  // q_profile_table uses; referential integrity joins the fact to the
  // DISTINCT dimension KEY set — UNHINTED, so the stats/AQE-driven
  // planner broadcasts a small dim key set (the fixture case, spec-
  // asserted) and genuinely degrades to a shuffle join past the
  // broadcast threshold (an explicit broadcast() hint would abort at
  // the 8 GiB ceiling instead — the VERDICT r8 cliff). No second fact
  // scan, no row-grain
  // output: violations leave as counts, a violation SAMPLE would be the
  // q_profile_skew TakeOrdered pattern.
  /** Declared expectation suite over `orders` (fact) vs `customer`
    * (dimension). NULL handling: each violation counts rows where the
    * constraint's own predicate fails on a NON-NULL value — nullness is
    * its own constraint row, never double-counted. */
  private val OrderStatusDomain = Seq("O", "F", "P")

  private val expectations = QueryDef(
    "q_expectations",
    (s, d) => {
      import s.implicits._
      val custKeys = Tables.customer(s, d)
        .select($"c_custkey".as("ck")).distinct()
      val m = Tables.orders(s, d)
        .join(custKeys, $"o_custkey" === $"ck", "left")
        .agg(
          count(lit(1)).as("n_rows"),
          count(when($"o_orderkey".isNull, 1)).as("v_key_null"),
          (count($"o_orderkey") - countDistinct($"o_orderkey"))
            .as("v_key_dup"),
          count(when($"o_custkey".isNotNull && $"ck".isNull, 1))
            .as("v_ref"),
          count(when($"o_totalprice".isNotNull && $"o_totalprice" < 0, 1))
            .as("v_price"),
          count(when($"o_orderstatus".isNotNull &&
            !$"o_orderstatus".isin(OrderStatusDomain: _*), 1))
            .as("v_status"),
          count(when($"o_orderdate".isNull, 1)).as("v_date"))
      val rows = Seq(
        ("o_custkey", "ref_customer", "v_ref"),
        ("o_orderdate", "not_null", "v_date"),
        ("o_orderkey", "not_null", "v_key_null"),
        ("o_orderkey", "unique", "v_key_dup"),
        ("o_orderstatus", s"domain_${OrderStatusDomain.mkString("").toLowerCase}", "v_status"),
        ("o_totalprice", "range_nonneg", "v_price"))
      m.select($"n_rows", explode(array(rows.map { case (c, k, v) =>
          struct(lit(c).as("col_name"), lit(k).as("constraint_kind"),
            col(v).cast("long").as("n_violations"))
        }: _*)).as("e"))
        .select($"e.col_name".as("col_name"),
          $"e.constraint_kind".as("constraint_kind"),
          $"n_rows", $"e.n_violations".as("n_violations"),
          ($"e.n_violations" === 0L).cast("long").as("pass"))
        .orderBy($"col_name", $"constraint_kind")
    },
    Some(s"""WITH j AS (
        SELECT o.*, c.ck FROM orders o
        LEFT JOIN (SELECT DISTINCT c_custkey AS ck FROM customer) c
          ON o.o_custkey = c.ck),
      m AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
        CAST(count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS BIGINT) AS v_key_null,
        CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT) AS v_key_dup,
        CAST(count(CASE WHEN o_custkey IS NOT NULL AND ck IS NULL THEN 1 END) AS BIGINT) AS v_ref,
        CAST(count(CASE WHEN o_totalprice IS NOT NULL AND o_totalprice < 0 THEN 1 END) AS BIGINT) AS v_price,
        CAST(count(CASE WHEN o_orderstatus IS NOT NULL AND o_orderstatus NOT IN (${OrderStatusDomain.map("'" + _ + "'").mkString(",")}) THEN 1 END) AS BIGINT) AS v_status,
        CAST(count(CASE WHEN o_orderdate IS NULL THEN 1 END) AS BIGINT) AS v_date
        FROM j),
      r AS (
        SELECT 'o_custkey' AS col_name, 'ref_customer' AS constraint_kind, n_rows, v_ref AS n_violations FROM m
        UNION ALL SELECT 'o_orderdate', 'not_null', n_rows, v_date FROM m
        UNION ALL SELECT 'o_orderkey', 'not_null', n_rows, v_key_null FROM m
        UNION ALL SELECT 'o_orderkey', 'unique', n_rows, v_key_dup FROM m
        UNION ALL SELECT 'o_orderstatus', 'domain_${OrderStatusDomain.mkString("").toLowerCase}', n_rows, v_status FROM m
        UNION ALL SELECT 'o_totalprice', 'range_nonneg', n_rows, v_price FROM m)
      SELECT col_name, constraint_kind, n_rows, n_violations,
        CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS pass
      FROM r ORDER BY col_name, constraint_kind"""),
    "Expectations/constraint gate: declared per-column completeness, " +
      "uniqueness, range, domain, and referential checks in one fact " +
      "scan + a broadcast dim-key join; one row per constraint")

  override def defs: Seq[QueryDef] =
    Seq(profileTable, profileDrift, profileSkew, expectations)
}
