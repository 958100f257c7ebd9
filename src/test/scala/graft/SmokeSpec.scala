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
}
