package graft

import org.apache.spark.sql.functions._

/** q_agg_sketch_rollup: the re-aggregatable-partials contract. */
class SketchRollupSpec extends SparkTestBase {
  import spark.implicits._

  test("per-day estimates and the union-of-partials total match exact " +
      "distincts (sparse-mode-exact at fixture cardinality)") {
    val rows = q("q_agg_sketch_rollup")
      .as[(String, Long, Long)].collect().toSeq
    val ev = Tables.events(spark, sf)
      .select(to_date($"ts").cast("string").as("day"), $"user_id")
    val exactByDay = ev.groupBy($"day")
      .agg(countDistinct($"user_id").as("n"))
      .as[(String, Long)].collect().toMap
    val exactTotal = ev.select($"user_id").distinct().count()
    val (totals, days) = rows.partition(_._1 == "total")
    assert(totals.size === 1)
    assert(days.size === exactByDay.size)
    days.foreach { case (day, _, est) =>
      val exact = exactByDay(day)
      assert(math.abs(est - exact) <= math.max(1L, (exact * 0.05).toLong),
        s"day $day est $est vs exact $exact")
    }
    val (_, nEv, estTotal) = totals.head
    assert(nEv === days.map(_._2).sum)
    assert(math.abs(estTotal - exactTotal) <=
      math.max(1L, (exactTotal * 0.05).toLong),
      s"union est $estTotal vs exact $exactTotal")
  }

  test("audit flags are all green") {
    val flags = q("q_agg_sketch_rollup_audit")
      .select($"est_ok").as[Long].collect()
    assert(flags.nonEmpty && flags.forall(_ == 1L))
  }
}
