package graft

import graft.plans.AsOfJoin
import org.apache.spark.sql.functions._

/** Custom operator stack: AsOfJoinNode → AsOfJoinStrategy → AsOfJoinExec. */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("q_join_asof_exec plans through AsOfJoinExec") {
    val plan = q("q_join_asof_exec").queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin")) // nodeName strips the Exec suffix
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "custom operator must replace the O(n*m) fallback plan")
    // column pruning must reach the scan through the custom node
    assert(plan.linesIterator.exists(l =>
      l.contains("orders.parquet") && l.contains("o_orderkey") &&
        !l.contains("o_totalprice")))
  }

  test("custom exec result equals the composed range-asof query") {
    val a = q("q_join_asof_exec").collect().map(_.toSeq)
    val b = q("q_join_range_asof").collect().map(_.toSeq)
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }

  test("asof semantics on crafted rows: matches, boundary equality, unmatched") {
    val left = Seq(
      (1L, "2020-01-01 00:00:00"), // before all right rows -> null
      (2L, "2020-06-15 12:00:00"), // between -> 2020-06-01
      (3L, "2020-09-01 00:00:00"), // exact boundary -> itself
      (4L, "2021-12-31 00:00:00")  // after all -> last
    ).toDF("id", "t").select($"id", $"t".cast("timestamp").as("t"))
    val right = Seq(
      ("2020-06-01 00:00:00", "a"),
      ("2020-09-01 00:00:00", "b"),
      ("2020-12-01 00:00:00", "c")
    ).toDF("rt", "tag").select($"rt".cast("timestamp").as("rt"), $"tag")
    val got = AsOfJoin.asof(left, right, "t", "rt")
      .select($"id", $"tag").as[(Long, Option[String])].collect().toMap
    assert(got(1L) === None)
    assert(got(2L) === Some("a"))
    assert(got(3L) === Some("b"), "rightTime == leftTime must match (closed bound)")
    assert(got(4L) === Some("c"))
  }

  test("optimizer rule pushes left-side filters through the as-of node into the scan") {
    import org.apache.spark.sql.functions._
    val shipDates = Tables.lineitem(spark, sf)
      .select($"l_shipdate".cast("date").cast("timestamp").as("sd")).distinct()
    val joined = AsOfJoin.asof(Tables.orders(spark, sf), shipDates,
      "o_orderdate", "sd")
      .filter($"o_orderkey" < 100) // references only the left side
    val optimized = joined.queryExecution.optimizedPlan.toString
    // the Filter must sit BELOW the AsOfJoinNode after optimization
    val lines = optimized.linesIterator.toSeq
    val joinIdx = lines.indexWhere(_.contains("AsOfJoinNode"))
    val filterIdx = lines.indexWhere(_.contains("o_orderkey"), joinIdx)
    assert(joinIdx >= 0)
    val physical = joined.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters: [IsNotNull(o_orderkey), LessThan(o_orderkey,100)]"),
      "filter must reach the parquet scan:\n" + physical)
    assert(joined.count() === Tables.orders(spark, sf)
      .filter($"o_orderkey" < 100).count())
  }

  test("asof join validates the time column name") {
    val df = Seq((1L, "2020-01-01 00:00:00")).toDF("id", "t")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asof(df, df, "nope", "t")
    }
    assert(e.getMessage.contains("nope"))
  }
}
