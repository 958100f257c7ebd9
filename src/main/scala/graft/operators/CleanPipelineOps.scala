package graft.operators

import graft.{QueryDef, QueryPack, Tables}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end training-data cleaning pipeline — the engine's user
  * story in one declared query, composed entirely from operators that
  * are individually oracle-verified elsewhere:
  *
  *   documents
  *     → quality gate   (type-token ratio; q_text_quality semantics)
  *     → exact dedup    (keep lowest doc_id per normalized-content hash;
  *                       q_dedup_exact semantics)
  *     → near-dup purge (drop the doc2 side of every exact 3-gram
  *                       Jaccard >= 0.5 pair; q_dedup_ngram_jaccard
  *                       semantics — left_anti join)
  *     → corpus stats per language
  *
  * Everything is one Catalyst plan: the gates are pushed filters, the
  * dedups are shuffle-on-key joins/aggregations, and the final stats is
  * a map-side-combined aggregation — the same shapes already audited in
  * PLANS.md, composed.
  */
object CleanPipelineOps extends QueryPack {

  private def toks(c: Column): Column = split(lower(c), " +")

  private val pipelineClean = QueryDef(
    "q_pipeline_clean",
    (s, d) => {
      import s.implicits._
      val t = toks($"text")
      val quality = round(size(array_distinct(t)).cast("decimal(18,2)") / size(t), 6)
      // round-9 addition: the MODEL quality gate (hashed-ngram linear
      // scorer, TextOps.modelRawScore) composes after the heuristic TTR
      // gate — both are pushed per-row filters, still zero extra shuffle
      val (mn, mraw) = TextOps.modelRawScore($"text")
      val gated = Tables.documents(s, d)
        .withColumn("ttr", quality)
        .filter($"ttr" >= lit("0.30").cast("decimal(38,6)"))
        .withColumn("mn", mn).withColumn("mraw", mraw)
        .filter(TextOps.modelScore($"mn", $"mraw") >=
          lit(0).cast("decimal(38,6)"))
        .drop("mn", "mraw")
      val exactKept = gated
        .withColumn("chash", md5(regexp_replace(lower($"text"), "\\s+", " ")))
        .withColumn("keep", min($"doc_id").over(
          org.apache.spark.sql.expressions.Window.partitionBy($"chash")))
        .filter($"doc_id" === $"keep")
      // distinct BEFORE the anti join: the loser set is bounded by corpus
      // size, the raw pair stream is bounded by Σdf² — broadcasting the
      // latter blew past the 8 GiB broadcast ceiling at 10× scale.
      // Reads the SHARED materialized pair set (DedupOps.sharedNgramPairs)
      // instead of recomputing pair generation (VERDICT r8 task 3).
      val nearDupLosers = DedupOps.sharedNgramPairs(s, d)
        .select($"doc2".as("doc_id")).distinct()
      exactKept
        .join(nearDupLosers, Seq("doc_id"), "left_anti")
        .groupBy($"lang")
        .agg(count("*").as("n_docs"),
          sum($"n_chars").as("total_chars"),
          round(sum($"ttr").cast("decimal(38,6)") / count("*"), 6)
            .cast("decimal(38,6)").cast("double").as("avg_ttr"))
        .orderBy($"lang")
    },
    Some {
      val g = TextOps.modelSqlGrams("text")
      val scoreSql = TextOps.modelSqlScore(
        s"CAST(len($g) AS BIGINT)", TextOps.modelSqlRaw(g))
      // raw interpolator: the SQL contains regex escapes (\s+) that the
      // s-interpolator would reject as invalid escape sequences
      raw"""WITH gated AS (
        SELECT doc_id, lang, n_chars, text,
          round(CAST(len(list_distinct(regexp_split_to_array(lower(text), ' +'))) AS DECIMAL(18,2))
            / len(regexp_split_to_array(lower(text), ' +')), 6) AS ttr
        FROM documents
        WHERE round(CAST(len(list_distinct(regexp_split_to_array(lower(text), ' +'))) AS DECIMAL(18,2))
            / len(regexp_split_to_array(lower(text), ' +')), 6) >= 0.30
          AND $scoreSql >= 0),
      exact_kept AS (
        SELECT * FROM (
          SELECT g.*, min(doc_id) OVER (PARTITION BY
            md5(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS keep
          FROM gated g)
        WHERE doc_id = keep),
      w AS (SELECT doc_id, regexp_split_to_array(lower(text), ' +') AS w FROM documents),
      docs AS (
        SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        FROM w WHERE len(w) >= 3),
      counts AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_sh FROM docs),
      posting AS (SELECT doc_id, unnest(sh) AS shingle FROM docs),
      inter AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS i
        FROM posting a JOIN posting b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      losers AS (
        SELECT DISTINCT doc2 AS doc_id FROM inter
        JOIN counts c1 ON doc1 = c1.doc_id
        JOIN counts c2 ON doc2 = c2.doc_id
        WHERE CAST(round(CAST(i AS DECIMAL(18,2)) / (c1.n_sh + c2.n_sh - i), 6) AS DECIMAL(38,6)) >= 0.5)
      SELECT lang, count(*) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS total_chars,
        CAST(CAST(round(CAST(sum(ttr) AS DECIMAL(38,6)) / count(*), 6) AS DECIMAL(38,6)) AS DOUBLE) AS avg_ttr
      FROM exact_kept
      WHERE doc_id NOT IN (SELECT doc_id FROM losers)
      GROUP BY lang ORDER BY lang"""
    },
    "End-to-end cleaning pipeline: quality gates (heuristic + model) -> " +
      "exact dedup -> near-dup purge -> per-language corpus stats")

  // ------------------------- deterministic split + systematic sample
  // The corpus-management tail of every training pipeline: carve
  // train/val/test on a deterministic key function (stable across runs
  // and engines — no RNG state to reconcile at 100 TB) and take a
  // systematic 1-in-7 audit sample the same way. Pure map + one
  // group-cardinality-bounded aggregation; rows never shuffle except by
  // (lang, split).
  private val sampleSplit = QueryDef(
    "q_sample_split",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("split",
          when($"doc_id" % 10 < 8, "train")
            .when($"doc_id" % 10 === 8, "val")
            .otherwise("test"))
        .withColumn("in_sample", ($"doc_id" % 7 === 0).cast("long"))
        .groupBy($"lang", $"split")
        .agg(
          count("*").as("n_docs"),
          sum($"in_sample").cast("long").as("n_sampled"),
          sum($"n_chars".cast("long")).cast("long").as("total_chars"))
        .orderBy($"lang", $"split")
    },
    Some("""SELECT lang,
        CASE WHEN doc_id % 10 < 8 THEN 'train'
             WHEN doc_id % 10 = 8 THEN 'val'
             ELSE 'test' END AS split,
        count(*) AS n_docs,
        CAST(sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
        CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM documents GROUP BY 1, 2 ORDER BY lang, split"""),
    "Deterministic train/val/test split + systematic audit sample")

  override def defs: Seq[QueryDef] = Seq(pipelineClean, sampleSplit)
}
