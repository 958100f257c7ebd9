package graft

import graft.operators.SourceOps

/** q_schema_evolution contract: the declared-schema read (the 100 TB
  * path — no footer sweep at planning) agrees row-for-row with the
  * mergeSchema discovery read, predicate pushdown reaches BOTH schema
  * vintages, and the naive un-merged read really does exhibit the
  * hazard the operator exists to avoid. */
class SchemaEvolutionSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("declared-schema read == mergeSchema discovery read, and the " +
      "pre-column vintage surfaces as NULLs") {
    val dir = SourceOps.schemaEvoDir(spark, sf)
    val declared = spark.read.schema(SourceOps.evoSchema).parquet(dir)
      .orderBy($"doc_id").collect()
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
      .select($"doc_id", $"text", $"lang") // merge may reorder columns
      .orderBy($"doc_id").collect()
    assert(declared.length === merged.length && declared.nonEmpty)
    declared.zip(merged).foreach { case (a, b) => assert(a === b) }
    // vintage-1 rows (doc_id%3==0) carry NULL lang, vintage-2 rows don't
    val (v1, v2) = declared.partition(_.getAs[Long]("doc_id") % 3 == 0)
    assert(v1.nonEmpty && v1.forall(_.isNullAt(2)))
    assert(v2.nonEmpty && v2.forall(!_.isNullAt(2)))
  }

  test("a pushable predicate reaches the scan over the mixed-vintage " +
      "directory") {
    val dir = SourceOps.schemaEvoDir(spark, sf)
    val df = spark.read.schema(SourceOps.evoSchema).parquet(dir)
      .filter($"doc_id" > 100L)
    val scans = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.head.metadata.get("PushedFilters")
      .exists(_.contains("GreaterThan(doc_id")),
      "doc_id predicate not pushed over the drifted zone")
  }

  test("the unified view conserves the corpus: every doc lands exactly " +
      "once across the two vintages") {
    val total = q("q_schema_evolution").agg(sum($"n_docs")).as[Long].head()
    assert(total === Tables.documents(spark, sf).count())
  }
}
