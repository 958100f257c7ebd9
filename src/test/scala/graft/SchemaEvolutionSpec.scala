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

  test("v2 zone: the int32 vintage is PHYSICALLY narrow and the " +
      "declared scan widens it in place") {
    val dir = SourceOps.schemaEvo2Dir(spark, sf)
    // the v1 files really are int32 on disk (discovery read without a
    // declared schema sees the physical leaf type)
    val v1Phys = spark.read.parquet(dir) // first footer wins: no lang cols
    // find a file whose inferred doc_id is IntegerType
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getAbsolutePath)
    val physTypes = files.map(f =>
      spark.read.parquet(f).schema("doc_id").dataType).toSet
    assert(physTypes.contains(org.apache.spark.sql.types.IntegerType),
      "fixture lost its int32 vintage")
    assert(physTypes.contains(org.apache.spark.sql.types.LongType))
    // the declared read returns LongType for every row, values intact
    val declared = spark.read.schema(SourceOps.evo2Schema).parquet(dir)
    assert(declared.schema("doc_id").dataType ===
      org.apache.spark.sql.types.LongType)
    val ids = declared.select($"doc_id").as[Long].collect().sorted
    val src = Tables.documents(spark, sf)
      .select($"doc_id").as[Long].collect().sorted
    assert(ids.toSeq === src.toSeq,
      "widened ids diverge from the source corpus")
    assert(v1Phys.columns.contains("doc_id")) // touch to avoid unused warn
  }

  test("v2 zone: rename resolution — lang_code and lang fold to one " +
      "effective column, NULL default applied uniformly") {
    val dir = SourceOps.schemaEvo2Dir(spark, sf)
    val rows = spark.read.schema(SourceOps.evo2Schema).parquet(dir)
      .select($"doc_id", $"lang_code", $"lang",
        coalesce($"lang", $"lang_code", lit("und")).as("lang_eff"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getAs[Long]("doc_id") % 3
      if (m == 0) { // int32 pre-lang vintage: both names NULL -> default
        assert(r.isNullAt(1) && r.isNullAt(2))
        assert(r.getAs[String]("lang_eff") === "und")
      } else if (m == 1) {
        // renamed vintage: the NEW name is never set; the OLD name
        // carries whatever the source had — possibly NULL (the oracles
        // are deliberately NULL-lang-defensive, so this assert must be
        // too: ADVICE r14), in which case the default applies
        assert(r.isNullAt(2))
        val expected = Option(r.getAs[String]("lang_code")).getOrElse("und")
        assert(r.getAs[String]("lang_eff") === expected)
      } else {
        // current vintage: the OLD name is never set; same NULL-default
        // defence on the new name
        assert(r.isNullAt(1))
        val expected = Option(r.getAs[String]("lang")).getOrElse("und")
        assert(r.getAs[String]("lang_eff") === expected)
      }
    }
  }

  test("v2 zone: a pushable doc_id predicate reaches the scan and " +
      "filters the WIDENED column correctly across all three vintages") {
    val dir = SourceOps.schemaEvo2Dir(spark, sf)
    val df = spark.read.schema(SourceOps.evo2Schema).parquet(dir)
      .filter($"doc_id" > 100L)
    val scans = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.head.metadata.get("PushedFilters")
      .exists(_.contains("GreaterThan(doc_id")),
      "doc_id predicate not pushed over the three-vintage zone")
    // and the filter is CORRECT against the narrow physical vintage
    val expected = Tables.documents(spark, sf)
      .filter($"doc_id" > 100L).count()
    assert(df.count() === expected)
  }
}
