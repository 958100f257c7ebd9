package graft

import java.sql.Timestamp

/** q_expectations planted-violation corpus (VERDICT r11 task 7): a
  * scratch orders/customer pair with one known violation per declared
  * constraint; the gate must count each exactly once and pass the
  * clean fixtures. */
class ExpectationsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val plantedDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_expectations").toString
    // (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate)
    val orders = Seq[(Option[Long], Option[Long], String, Double, Option[Timestamp])](
      (Some(1L), Some(10L), "O", 100.0, Some(ts("2024-01-01 00:00:00"))), // clean
      (Some(2L), Some(10L), "F", 200.0, Some(ts("2024-01-02 00:00:00"))), // clean
      (None,     Some(10L), "O", 10.0,  Some(ts("2024-01-03 00:00:00"))), // key null
      (Some(5L), Some(11L), "P", 50.0,  Some(ts("2024-01-04 00:00:00"))), // dup 1
      (Some(5L), Some(11L), "P", 60.0,  Some(ts("2024-01-05 00:00:00"))), // dup 2 (1 excess)
      (Some(6L), Some(999L), "O", 70.0, Some(ts("2024-01-06 00:00:00"))), // orphan custkey
      (Some(7L), Some(10L), "O", -5.0,  Some(ts("2024-01-07 00:00:00"))), // negative price
      (Some(8L), Some(11L), "X", 80.0,  Some(ts("2024-01-08 00:00:00"))), // bad status
      (Some(9L), Some(10L), "F", 90.0,  None)                             // date null
    )
    orders.toDF("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate")
      .withColumn("o_orderpriority", org.apache.spark.sql.functions.lit("1-URGENT"))
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    Seq((10L, "a"), (11L, "b")).toDF("c_custkey", "c_name")
      .coalesce(1).write.parquet(s"$dir/customer.parquet")
    dir
  }

  test("each planted violation is counted exactly once") {
    val got = SparkEntry.queries("q_expectations")(spark, plantedDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_violations"), r.getAs[Long]("pass")))).toMap
    assert(got(("o_orderkey", "not_null")) === ((1L, 0L)))
    assert(got(("o_orderkey", "unique")) === ((1L, 0L)), "one excess dup row")
    assert(got(("o_custkey", "ref_customer")) === ((1L, 0L)))
    assert(got(("o_totalprice", "range_nonneg")) === ((1L, 0L)))
    assert(got(("o_orderstatus", "domain_ofp")) === ((1L, 0L)))
    assert(got(("o_orderdate", "not_null")) === ((1L, 0L)))
    assert(got.values.forall(_._1 >= 0L) && got.size === 6)
  }

  test("the clean fixture corpus passes every constraint") {
    val rows = q("q_expectations").collect()
    assert(rows.length === 6)
    assert(rows.forall(_.getAs[Long]("pass") === 1L),
      rows.filter(_.getAs[Long]("pass") === 0L)
        .map(r => s"${r.getString(0)}/${r.getString(1)}").mkString(","))
  }

  test("the referential check broadcasts the dimension key side") {
    val plan = q("q_expectations").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"dim-key join should broadcast:\n$plan")
  }
}
