package graft

import org.apache.spark.sql.functions._

/** Core tier (SURVEY §2.1 reference semantics). Literal-value style follows
  * the reference's own tests (tests/test_transform.py:7-55). */
class CoreOpsSpec extends SparkTestBase {
  import spark.implicits._

  // BOTH fixture scales the harness touches (specs at sf0.001, the
  // driver's oracle gate at sf0.01): a scale-dependent literal that
  // empties a query at either sf (round-3 q_sink_orc_roundtrip's
  // event_id >= 5000) surfaces here instead of in the round artifact.
  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01"))
    test(s"all queries return rows on ${new java.io.File(dir).getName}") {
      for (name <- SparkEntry.queries.keys)
        assert(SparkEntry.queries(name)(spark, dir).count() > 0,
          s"$name returned no rows at $dir")
    }

  test("entry flagship smoke: rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q_scan_parquet totals match table size") {
    val r = q("q_scan_parquet").collect().head
    assert(r.getAs[Long]("n_rows") === Tables.lineitem(spark, sf).count())
    assert(r.getAs[Long]("min_key") === 0L)
  }

  test("q_project_cast preserves cardinality and renames") {
    val df = q("q_project_cast")
    assert(df.columns.toSet === Set("id", "uid", "etype", "value_dec", "server_ts"))
    assert(df.count() === Tables.events(spark, sf).count())
  }

  test("q_filter_between keeps only rows inside the closed range") {
    val secs = q("q_filter_between").select($"ts_sec").as[Long].collect()
    val lo = java.time.Instant.parse("2024-01-05T00:00:00Z").getEpochSecond
    val hi = java.time.Instant.parse("2024-01-12T00:00:00Z").getEpochSecond
    assert(secs.nonEmpty && secs.forall(s => s >= lo && s <= hi))
  }

  test("q_agg_avg_window5m: avg within [min,max] of window, win_start on 5-min grain") {
    val rows = q("q_agg_avg_window5m").collect()
    assert(rows.forall(_.getAs[Long]("win_start") % 300 == 0))
    val byHand = Tables.events(spark, sf)
      .groupBy(window($"ts", "5 minutes"), $"event_type").count().count()
    assert(rows.length === byHand.toInt)
  }

  test("q_throttle_dedup: at most one event per (user, minute)") {
    val df = q("q_throttle_dedup")
    assert(df.groupBy("user_id", "minute_bucket").count()
      .filter($"count" > 1).count() === 0)
  }

  test("q_window_fallback: filled value equals current avg or previous non-null") {
    val rows = q("q_window_fallback").orderBy("win_start").collect()
    var lastSeen: java.lang.Double = null
    rows.foreach { r =>
      val cur = r.getAs[java.lang.Double]("avg_v")
      val filled = r.getAs[java.lang.Double]("avg_filled")
      if (cur != null) assert(filled === cur)
      else if (lastSeen != null) assert(filled === lastSeen)
      else assert(filled == null)
      if (cur != null) lastSeen = cur
    }
  }

  test("q_stream_combine: one wide row per shared window") {
    val df = q("q_stream_combine")
    assert(df.columns.toSet === Set("win_start", "avg_purchase", "avg_view"))
    assert(df.groupBy("win_start").count().filter($"count" > 1).count() === 0)
  }

  test("q_round_format: one row per event_type, string matches decimal") {
    val rows = q("q_round_format").collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val decVal = r.getAs[Double]("avg_rounded")
      assert(r.getAs[String]("avg_str") ===
        "%.2f".formatLocal(java.util.Locale.ROOT, decVal))
    }
  }
}
