package graft.operators

import graft.{QueryDef, QueryPack, Tables}
import graft.functions.DecimalAvg
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

/** Extensibility showcase (SURVEY §7.2 step 5): queries built on the
  * engine's custom primitives — the typed [[DecimalAvg]] Aggregator here,
  * the [[graft.functions.SimHash64]] Catalyst expression in DedupOps.
  * Both run as ordinary partial+final aggregates / codegen'd projections,
  * so they inherit Spark's distribution for free.
  */
object CustomOps extends QueryPack {

  private val decimalAvg = QueryDef(
    "q_custom_decimal_avg",
    (s, d) => {
      import s.implicits._
      val avgUdaf = udaf(new DecimalAvg, Encoders.scalaDouble)
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          avgUdaf($"l_extendedprice").cast("decimal(38,6)").cast("double").as("avg_price"),
          count("*").as("n_rows"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
      CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))) / count(*), 6) AS DECIMAL(38,6)) AS DOUBLE) AS avg_price,
      count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    "Typed Aggregator: decimal-exact average (reference O9 semantics, " +
      "utils/load.py:33-35, made exact)")

  // Generator-style op through the TYPED API: Dataset.flatMap emitting
  // (doc_id, shingle) rows — the user-code escape hatch when no built-in
  // generator fits. Still fully distributed (flatMap is a narrow map
  // stage); only the counting aggregation shuffles.
  private val flatmapShingles = QueryDef(
    "q_flatmap_shingles",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id", $"text").as[(Long, String)]
        .flatMap { case (id, text) =>
          text.toLowerCase.split(" +").toSeq.sliding(3)
            .filter(_.size == 3).map(w => (id, w.mkString(" ")))
        }
        .toDF("doc_id", "shingle")
        .groupBy($"doc_id")
        .agg(count("*").as("n_shingles"),
          countDistinct($"shingle").as("n_distinct"))
        .orderBy($"doc_id")
    },
    Some("""WITH w AS (
        SELECT doc_id, regexp_split_to_array(lower(text), ' +') AS w FROM documents)
      SELECT doc_id, CAST(len(w) - 2 AS BIGINT) AS n_shingles,
        CAST(len(list_distinct(list_transform(range(1, len(w) - 1),
          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS BIGINT) AS n_distinct
      FROM w WHERE len(w) >= 3 ORDER BY doc_id"""),
    "Typed Dataset.flatMap generator: per-doc shingle emission + counts")

  // Plain registered Scala UDF — completing the user-extension surface
  // (Expression > Aggregator > flatMap > UDF, in preference order; a UDF
  // is a codegen black box, used here only to DEMONSTRATE the API).
  // Deterministic slugify, so a DuckDB regexp oracle reproduces it.
  private val udfScala = QueryDef(
    "q_udf_scala",
    (s, d) => {
      import s.implicits._
      val slug = udf((x: String) =>
        if (x == null) null
        else x.toLowerCase.replaceAll("[^a-z0-9]+", "-"))
      Tables.part(s, d)
        .select($"p_partkey", slug($"p_name").as("name_slug"))
        .withColumn("slug_len", length($"name_slug"))
        .orderBy($"p_partkey")
    },
    Some("""SELECT p_partkey,
      regexp_replace(lower(p_name), '[^a-z0-9]+', '-', 'g') AS name_slug,
      CAST(length(regexp_replace(lower(p_name), '[^a-z0-9]+', '-', 'g')) AS INT) AS slug_len
      FROM part ORDER BY p_partkey"""),
    "Registered Scala UDF (slugify) — the user-code extension surface")

  // Native TypedImperativeAggregate tier: bounded-heap grouped top-k
  // (functions/TopKPairs) — partial+final aggregation keeps k rows per
  // (group, partition); the input stream is never sorted or shuffled
  // (contrast q_winfunc_rank, which sorts each window partition). The
  // same kernel is the scale fix for q_simsearch_cosine's 400M-row
  // scored stream. li_id = l_orderkey*10 + l_linenumber (unique:
  // l_linenumber ∈ 1..7) makes the (price DESC, id ASC) rank total.
  private val topkAgg = QueryDef(
    "q_custom_topk_agg",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .select($"l_returnflag",
          ($"l_orderkey" * 10 + $"l_linenumber").cast("long").as("li_id"),
          $"l_extendedprice".as("price"))
        .groupBy($"l_returnflag")
        .agg(graft.functions.TopKPairs.top_k_pairs($"price", $"li_id", 3).as("tk"))
        .select($"l_returnflag", posexplode($"tk"))
        .select($"l_returnflag", ($"pos" + 1).cast("long").as("rank"),
          $"col.id".as("li_id"), $"col.score".as("price"))
        .orderBy($"l_returnflag", $"rank")
    },
    Some("""SELECT l_returnflag,
      CAST(row_number() OVER (PARTITION BY l_returnflag
        ORDER BY l_extendedprice DESC, l_orderkey * 10 + l_linenumber) AS BIGINT) AS rank,
      CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS li_id,
      l_extendedprice AS price
      FROM lineitem QUALIFY rank <= 3 ORDER BY l_returnflag, rank"""),
    "Native TypedImperativeAggregate: bounded-heap grouped top-k " +
      "(no sort, map-side k-row partials)")

  override def defs: Seq[QueryDef] =
    Seq(decimalAvg, flatmapShingles, udfScala, topkAgg)
}
