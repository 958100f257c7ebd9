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

  test("streamed evolution is exactly-once across a restart AT the " +
      "vintage boundary: the widened and renamed vintages arrive only " +
      "AFTER the checkpoint resume") {
    val base = java.nio.file.Paths.get("target", "test-schema-evo-restart")
      .toAbsolutePath
    graft.Fs.deleteRecursively(base)
    val landing = base.resolve("landing")
    java.nio.file.Files.createDirectories(landing)
    val ckpt = base.resolve("ckpt").toString
    val out = base.resolve("out").toString
    // vintage files oldest-first from the pinned fixture
    val srcDir = new java.io.File(
      SourceOps.schemaEvo2StreamDir(spark, sf))
    val srcFiles = srcDir.listFiles().filter(_.getName.startsWith("part-"))
      .sortBy(_.lastModified).toSeq
    assert(srcFiles.size === 3, "expected the three-vintage fixture")
    def copy(f: java.io.File): Unit =
      java.nio.file.Files.copy(f.toPath, landing.resolve(f.getName))
    def drain(): Unit = {
      val q = spark.readStream.schema(SourceOps.evo2Schema)
        .option("maxFilesPerTrigger", "1").parquet(landing.toString)
        .select($"doc_id", length($"text").as("len"),
          coalesce($"lang", $"lang_code", lit("und")).as("lang_eff"))
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              batchId: Long) =>
            batch.groupBy(col("lang_eff"))
              .agg(count(lit(1)).cast("long").as("n_docs"),
                sum(col("len")).cast("long").as("n_chars"),
                min(col("doc_id")).as("min_doc"),
                max(col("doc_id")).as("max_doc"))
              .withColumn("batch_id", lit(batchId))
              .write.mode("append").parquet(out)
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    copy(srcFiles.head); drain() // phase 1: only the int32 vintage
    copy(srcFiles(1)); copy(srcFiles(2)); drain() // RESTART: v2+v3 arrive
    val restarted = spark.read.parquet(out)
      .groupBy($"lang_eff", $"batch_id")
      .agg(max($"n_docs").as("n_docs"), max($"n_chars").as("n_chars"),
        max($"min_doc").as("min_doc"), max($"max_doc").as("max_doc"))
      .groupBy($"lang_eff")
      .agg(sum($"n_docs").cast("long").as("n_docs"),
        sum($"n_chars").cast("long").as("n_chars"),
        min($"min_doc").as("min_doc"), max($"max_doc").as("max_doc"))
      .orderBy($"lang_eff").collect().toSeq
    // == the batch answer AND the declared single-run streamed answer
    val batch = q("q_schema_evolution_v2")
      .select($"lang_eff", $"n_docs", $"n_chars", $"min_doc", $"max_doc")
      .orderBy($"lang_eff").collect().toSeq
    assert(restarted === batch,
      "restarted streamed answer diverges from the batch answer")
    assert(q("q_stream_schema_evolution").collect().toSeq === batch)
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
