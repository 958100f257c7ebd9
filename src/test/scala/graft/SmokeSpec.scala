package graft

/** Whole-surface smoke: every declared query executes at sf0.001 and
  * yields a well-formed (possibly empty) result. Individual semantics
  * are covered by the per-tier specs and the DuckDB oracle gate; this
  * catches a query that THROWS anywhere in the surface before the
  * driver does. */
class SmokeSpec extends SparkTestBase {

  test("every declared query executes and every oracle key is declared") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sf).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    // oracleSql must be a subset of queries (a dangling oracle key would
    // make the driver compare against a missing result dir)
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle keys without queries: $dangling")
  }

  test("no declared query emits nested columns (driver hash contract)") {
    // the driver's pandas lexsort crashes on array/map/struct cells
    // (round-3 q_agg_percentile_approx); Verify.assertFlatSchema is the
    // production guard — here it runs over the whole declared surface
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1))
      Verify.assertFlatSchema(name, fn(spark, sf).schema)
    // …and must actually fire on an offender
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val offender = Seq((1L, Seq(1.0, 2.0))).toDF("id", "vals")
    val e = intercept[Verify.SchemaContractViolation] {
      Verify.assertFlatSchema("synthetic", offender.schema)
    }
    assert(e.getMessage.contains("vals"))
    // struct + map forms trip it too
    val structy = offender.select(struct($"id").as("s"))
    intercept[Verify.SchemaContractViolation] {
      Verify.assertFlatSchema("synthetic2", structy.schema)
    }
  }
}
