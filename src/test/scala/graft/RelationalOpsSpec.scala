package graft

import org.apache.spark.sql.functions._

/** Ext relational tier: joins, aggregates, window functions, sort/set,
  * scalar batteries. Includes physical-plan shape assertions — at 100 TB
  * the plan IS the performance contract. */
class RelationalOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def plan(name: String): String =
    q(name).queryExecution.executedPlan.toString

  // ------------------------------------------------------------- joins
  test("q_join_broadcast plans a broadcast hash join") {
    assert(plan("q_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q_join_smj plans a sort-merge join (no broadcast of big sides)") {
    assert(plan("q_join_smj").contains("SortMergeJoin"))
  }

  test("q_join_star plans 1 SMJ + 2 broadcast dims, no extra fact shuffle") {
    // the 100 TB star shape: the fact lineage shuffles ONLY for the
    // big-big sort-merge, the aggregate, and the presentation sort —
    // never for a dimension
    val df = q("q_join_star")
    df.collect() // finalize any adaptive plan before counting operators
    // AQE's toString appends the pre-adaptive "== Initial Plan ==" after
    // the final plan — count operators in the FINAL section only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    def occ(needle: String): Int = needle.r.findAllIn(plan).length
    assert(occ("SortMergeJoin") === 1, plan)
    assert(occ("BroadcastHashJoin") === 2, plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    // shuffles: lineitem + orders into the SMJ, one for the aggregate,
    // one range exchange for the final orderBy — nothing else
    assert(occ("Exchange hashpartitioning") <= 3, plan)
    assert(occ("Exchange rangepartitioning") <= 1, plan)
  }

  test("q_join_semi_anti partitions all customers into exactly one tag") {
    val df = q("q_join_semi_anti")
    assert(df.count() === Tables.customer(spark, sf).count())
    assert(df.groupBy("c_custkey").count().filter($"count" > 1).count() === 0)
  }

  test("q_join_range_asof: asof date is the max ship date <= order date") {
    val rows = q("q_join_range_asof").limit(50).collect()
    val ships = Tables.lineitem(spark, sf)
      .select($"l_shipdate".cast("date").cast("string")).distinct()
      .as[String].collect().sorted
    rows.foreach { r =>
      val od = r.getAs[String]("order_date")
      val expected = ships.takeWhile(_ <= od).lastOption.orNull
      assert(r.getAs[String]("asof_ship_date") === expected)
    }
  }

  // -------------------------------------------------------------- aggs
  test("q_agg_groupby matches hand-computed group count") {
    val n = Tables.lineitem(spark, sf)
      .filter($"l_shipdate" <= lit("1998-09-02"))
      .select($"l_returnflag", $"l_linestatus").distinct().count()
    assert(q("q_agg_groupby").count() === n)
  }

  test("q_agg_percentile_approx estimates inside the GK rank-error bound") {
    // approx_percentile(_, p, a) guarantees a value whose rank is within
    // n/a of ceil(p*n); bracket each estimate between the exact sorted
    // values at rank +- (n/a + 1) per group
    val rows = q("q_agg_percentile_approx").collect()
    assert(rows.nonEmpty)
    val byFlag = Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_quantity".cast("double"))
      .as[(String, Double)].collect()
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val vals = byFlag(flag)
      val n = vals.length
      val slack = n / 10000 + 1
      def bracket(p: Double, est: Double): Unit = {
        val rank = math.ceil(p * n).toInt
        val lo = vals(math.max(0, rank - slack - 1))
        val hi = vals(math.min(n - 1, rank + slack - 1))
        assert(est >= lo && est <= hi,
          s"$flag p=$p est=$est outside exact-rank bracket [$lo,$hi] (n=$n)")
      }
      bracket(0.5, r.getAs[Number]("p50_qty").doubleValue())
      bracket(0.9, r.getAs[Number]("p90_qty").doubleValue())
      val p25 = r.getAs[Number]("p25_qty").doubleValue()
      val p75 = r.getAs[Number]("p75_qty").doubleValue()
      assert(p25 <= p75)
      bracket(0.25, p25)
      bracket(0.75, p75)
      assert(r.getAs[Long]("n_rows") === n.toLong)
    }
  }

  test("q_agg_grouping_sets: irregular levels present, rollup-only level absent") {
    val rows = q("q_agg_grouping_sets").collect()
    val gids = rows.map(_.getAs[Long]("gid")).toSet
    // detail (00=0), status-only (10=2), grand total (11=3) — and NOT the
    // priority-only level (01=1) a rollup would force
    assert(gids === Set(0L, 2L, 3L))
    val total = rows.filter(_.getAs[Long]("gid") == 3L)
    assert(total.length === 1)
    assert(total.head.getAs[Long]("n") === Tables.orders(spark, sf).count())
    // status-only level equals the direct group-by
    val statusLevel = rows.filter(_.getAs[Long]("gid") == 2L)
      .map(r => r.getAs[String]("status") -> r.getAs[Long]("n")).toMap
    val direct = Tables.orders(spark, sf).groupBy($"o_orderstatus").count()
      .as[(String, Long)].collect().toMap
    assert(statusLevel === direct)
  }

  test("q_agg_hll estimate within 5% of exact distinct") {
    val est = q("q_agg_hll").collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("approx_users")).toMap
    val exact = Tables.events(spark, sf)
      .groupBy($"event_type").agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(est(k) - n) <= math.max(1, n * 0.05), s"$k: est=${est(k)} exact=$n")
    }
  }

  test("q_rollup_cube has detail, subtotal and grand-total grouping levels") {
    val gids = q("q_rollup_cube").select($"gid").distinct().as[Long].collect().toSet
    assert(gids === Set(0L, 1L, 3L))
    val grand = q("q_rollup_cube").filter($"gid" === 3).collect()
    assert(grand.length === 1 &&
      grand.head.getAs[Long]("n_cust") === Tables.customer(spark, sf).count())
  }

  // ----------------------------------------------------------- windows
  test("q_winfunc_rank keeps at most 3 rows per customer, rank consistent") {
    val df = q("q_winfunc_rank")
    assert(df.filter($"rn" > 3).count() === 0)
    assert(df.filter($"rnk" > $"rn").count() === 0) // rank <= row_number always
  }

  test("q_winfunc_frame running counts are 1..n per customer") {
    val bad = q("q_winfunc_frame")
      .groupBy($"o_custkey")
      .agg(max($"running_orders").as("mx"), count("*").as("n"))
      .filter($"mx" =!= $"n")
    assert(bad.count() === 0)
  }

  // ---------------------------------------------------- sort / set ops
  test("q_sort_limit_topk plans TakeOrdered and is sorted descending") {
    assert(plan("q_sort_limit_topk").contains("TakeOrderedAndProject"))
    val prices = q("q_sort_limit_topk")
      .select($"price".cast("double")).as[Double].collect()
    assert(prices.length === 100)
    assert(prices.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("q_setops: both + only_1995 partition the 1995 key set") {
    val byTag = q("q_setops").groupBy($"tag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = Tables.orders(spark, sf).filter(year($"o_orderdate") === 1995)
      .select($"o_custkey").distinct().count()
    assert(byTag("both") + byTag("only_1995") === a)
    assert(byTag("any") >= byTag("both"))
  }

  // ------------------------------------------------------------ scalar
  test("q_scalar_string extracts brand digits") {
    val r = q("q_scalar_string").limit(5).collect()
    r.foreach { row =>
      assert(row.getAs[String]("brand_num").forall(_.isDigit))
      assert(row.getAs[String]("brand_type").contains("|"))
    }
  }

  test("q_scalar_json parses every props payload") {
    assert(q("q_scalar_json").count() === Tables.events(spark, sf).count())
  }

  test("q_array_map: 64 dims, sum consistent with elements") {
    val r = q("q_array_map").limit(10).collect()
    r.foreach(row => assert(row.getAs[Int]("dim") === 64))
  }

  test("q_join_outer covers both year key sets with NULL off-sides") {
    import org.apache.spark.sql.functions.year
    val df = q("q_join_outer")
    def keys(y: Int) = Tables.orders(spark, sf)
      .filter(year($"o_orderdate") === y)
      .select($"o_custkey").distinct().as[Long].collect().toSet
    val (k95, k96) = (keys(1995), keys(1996))
    assert(df.count().toInt === (k95 ++ k96).size)
    assert(df.filter($"n_1995".isNull).count().toInt === (k96 -- k95).size)
    assert(df.filter($"n_1996".isNull).count().toInt === (k95 -- k96).size)
  }

  test("q_winfunc_dist: ratio functions within bounds, first <= last") {
    val bad = q("q_winfunc_dist").filter(
      $"pct_rank" < 0 || $"pct_rank" > 1 ||
      $"cume" <= 0 || $"cume" > 1 ||
      $"quartile" < 1 || $"quartile" > 4 ||
      $"first_key" > $"last_key")
    assert(bad.count() === 0)
  }

  test("q_agg_collect: statuses are sorted distinct renderings") {
    q("q_agg_collect").collect().foreach { r =>
      val parts = r.getAs[String]("statuses").split(",").toSeq
      assert(parts === parts.distinct.sorted)
    }
  }

  test("q_join_cross: |nation| x |region| rows, exactly one home region each") {
    val df = q("q_join_cross")
    assert(df.count() === 25L * 5L)
    assert(df.groupBy($"n_name").agg(sum($"is_home").as("h"))
      .filter($"h" =!= 1).count() === 0)
  }

  test("q_agg_cube: grand total row equals table count") {
    val total = q("q_agg_cube")
      .filter($"status" === "ALL" && $"priority" === "ALL")
      .select($"n").as[Long].collect()
    assert(total.toSeq === Seq(Tables.orders(spark, sf).count()))
  }

  test("q_agg_sliding_window: every event counted exactly twice") {
    val counted = q("q_agg_sliding_window").agg(sum($"n_events")).as[Long].head()
    assert(counted === 2 * Tables.events(spark, sf).count())
  }

  test("q_setops_all: inter_all + except_all multiplicities = left bag") {
    val leftBag = Tables.lineitem(spark, sf)
      .filter($"l_quantity" < 25).count()
    assert(q("q_setops_all").count() === leftBag)
  }

  test("q_na_ops: no nulls leave the query, drop flag consistent") {
    val df = q("q_na_ops")
    assert(df.filter($"status".isNull || $"prio".isNull).count() === 0)
    assert(df.filter($"kept_by_drop" === 0 &&
      $"status" =!= "UNKNOWN" && $"prio" =!= "0-NONE").count() === 0)
  }

  test("q_udf_scala: slugs are lowercase alnum-dash only") {
    q("q_udf_scala").limit(20).collect().foreach { r =>
      assert(r.getAs[String]("name_slug").forall(c =>
        c.isDigit || (c >= 'a' && c <= 'z') || c == '-'))
    }
  }

  test("q_winfunc_range: 30-day spend >= own order price, count >= 1") {
    val bad = q("q_winfunc_range").filter($"n_30d" < 1 || $"spend_30d" <= 0)
    assert(bad.count() === 0)
  }

  test("q_scalar_math: floor <= ceil, mod in range, abs consistent") {
    val bad = q("q_scalar_math").filter(
      $"floor_bal" > $"ceil_bal" || $"mod7" < 0 || $"mod7" > 6 ||
      $"abs_bal" < 0 || ($"sign_bal" === -1 && $"bal_floor0" =!= 0.0))
    assert(bad.count() === 0)
  }
}
