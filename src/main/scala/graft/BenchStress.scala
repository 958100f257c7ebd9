package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off scale-stress run (SURVEY §2.4): replicate the largest fixture
  * REP× with remapped keys and re-time the queries whose cost is NOT
  * linear in input size — the Σdf² shingle join, banded/bucketed
  * similarity ops, and the stateful streams — to check that the tuning
  * chosen at sf0.1 still holds an order of magnitude up (~sf1).
  *
  * Replication is shape-preserving, not row-copying:
  *  - documents: doc_id remapped per replica; a per-replica token is
  *    appended to the text, so shingle document-frequencies scale ×REP
  *    (the df-skew stress) while replicas are near- but not exact dups.
  *  - events: event_id remapped; user_id offset per replica, so session/
  *    state-key cardinality scales ×REP (state-store stress) rather than
  *    events-per-session.
  *  - embeddings: vec_id remapped; each component nudged by a per-replica
  *    epsilon so replicas are near-neighbors, not exact ties (bucket-
  *    population stress for SRP/IVF).
  *  - lineitem: copied with remapped order keys — the linear-scan
  *    reference point.
  *
  * The stress corpus is derived, written under target/, and used ONLY for
  * this timing artifact — correctness always runs against the immutable
  * driver fixtures.
  *
  * Output: one JSON line, same shape as Bench, with sf = "<base>x<REP>".
  */
object BenchStress {

  /** Queries with super-linear or stateful cost profiles, plus one linear
    * scan as the yardstick. */
  private val StressQueries = Seq(
    "q_agg_groupby", // linear yardstick
    "q_dedup_exact",
    "q_dedup_ngram_jaccard",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_text_fingerprint_winnow",
    "q_text_boilerplate",
    "q_pipeline_clean",
    "q_sink_compaction",
    "q_simsearch_cosine",
    "q_simsearch_ann_srp",
    "q_simsearch_ivf",
    "q_dedup_embedding",
    "q_sessionize",
    "q_stream_tumbling",
    "q_stream_dedup",
    "q_stream_session",
    // round-3 additions: stream-static enrichment (broadcast side grows
    // with the dim table), foreachBatch sink (per-batch write amplification),
    // JDBC round trip (writer fan-in) — stressed so the tracked surface
    // matches the declared surface
    "q_stream_static_join",
    "q_stream_foreachbatch",
    "q_sink_jdbc_roundtrip",
    // round-4 curation tier: merge shuffles |keys| rows (WindowGroupLimit
    // pushdown), decontamination broadcasts a gram index that grows with
    // the test set, packing windows over 32 shards — all claimed ~linear
    "q_merge_upsert",
    "q_decontaminate",
    "q_pack_sequences")

  def materialize(s: SparkSession, base: String, rep: Int): String = {
    import s.implicits._
    val name = s"${new java.io.File(base).getName}x$rep"
    val dir = Paths.get("target", "stress", name).toAbsolutePath
    val marker = dir.resolve("_complete")
    if (Files.exists(marker)) return dir.toString
    Files.createDirectories(dir)
    val reps = s.range(rep).select($"id".cast("int").as("rep"))

    def write(df: DataFrame, table: String): Unit =
      df.write.mode("overwrite").parquet(dir.resolve(s"$table.parquet").toString)

    val docs = Tables.documents(s, base)
    write(docs.crossJoin(reps)
      .withColumn("doc_id", $"doc_id" * rep + $"rep")
      .withColumn("text", concat($"text", lit(" r"), $"rep"))
      .withColumn("n_chars", length($"text").cast(docs.schema("n_chars").dataType))
      .drop("rep"), "documents")

    // events.ts is TIMESTAMP(NANOS); keep it as raw nanos LONG on disk so
    // Tables.events' legacy-long read path round-trips (Tables.scala:17-28)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    write(Tables.load(s, base, "events").crossJoin(reps)
      .withColumn("event_id", $"event_id" * rep + $"rep")
      .withColumn("user_id", $"user_id" + $"rep".cast("long") * 1000000L)
      .drop("rep"), "events")

    val emb = Tables.embeddings(s, base)
    write(emb.crossJoin(reps)
      .withColumn("vec_id", $"vec_id" * rep + $"rep")
      .withColumn("embedding",
        transform($"embedding",
          x => (x + $"rep".cast("float") * lit(1e-3f)).cast("float")))
      .drop("rep"), "embeddings")

    write(Tables.lineitem(s, base).crossJoin(reps)
      .withColumn("l_orderkey", $"l_orderkey" * rep + $"rep")
      .drop("rep"), "lineitem")

    // dim tables ride along unreplicated — at scale the fact side grows,
    // the enrichment dim does not (q_stream_static_join's broadcast side)
    write(Tables.nation(s, base), "nation")

    Files.write(marker, Array.empty[Byte])
    dir.toString
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rep = sys.env.getOrElse("SPARK_GRAFT_STRESS_REP", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = materialize(spark, base, rep)

    // the two ngram-jaccard strategies head-to-head at stress scale: the
    // df-skew question ("flip the default to prefix-filter?") is decided
    // by this artifact, not by sf0.1 numbers
    val extra: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "x_ngram_prefix_filter" ->
        ((s, d) => operators.DedupOps.ngramJaccardPairs(s, d, prefixFilter = true)))

    val all = StressQueries.map(n => n -> SparkEntry.queries(n)) ++ extra
    all.foreach { case (_, fn) => // warm-up: JIT + staging materialization
      try fn(spark, dir).count() catch { case _: Throwable => () }
      spark.sharedState.cacheManager.clearCache()
    }
    val results = all.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, dir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"STRESS-FAIL $name: ${e.getClass.getName}: " +
            String.valueOf(e.getMessage).take(500))
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      name -> (if (ok) Some(dt) else None)
    }
    def f(v: Double): String =
      "%.1f".formatLocal(java.util.Locale.ROOT, v)
    // failures surface as "fail" (not a fake negative timing) and are
    // EXCLUDED from the total, so one red query can't corrupt the metric
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + v.map(f).getOrElse("\"fail\"") }
      .mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum
    val nFail = results.count(_._2.isEmpty)
    if (nFail > 0) System.err.println(s"STRESS: $nFail queries failed")
    val sfName = s"${new java.io.File(base).getName}x$rep"
    println(s"""{"metric":"stress_total","value":${f(total)},"unit":"sec","queries":$qs,"sf":"$sfName"}""")
    spark.stop()
  }
}
