package graft.operators

import graft.{QueryDef, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-composition operators: domain-mixture rebalancing weights and
  * context-window chunking — the two steps between a cleaned corpus and
  * a training shard list (The Pile / DoReMi-class mixing and the
  * fixed-context chunking every decoder pipeline runs; both public
  * formulations).
  *
  * Scale posture: q_mix_weights is one corpus-sized aggregation whose
  * output is domain-cardinality-sized (the windows below run over
  * #sources rows, never the corpus); q_text_chunk is a pure per-row map
  * + bounded explode (≈ n_tokens/stride rows per doc). Nothing shuffles
  * except the final presentation sorts.
  *
  * Determinism: all shares/factors are exact-decimal with INTEGER
  * denominators — the additive-smoothing algebra is rearranged so no
  * decimal-by-decimal division exists anywhere (engine decimal-division
  * scale rules differ; integer denominators follow the Jaccard
  * precedent).
  */
object MixOps extends QueryPack {

  // ----------------------------------------------- q_mix_weights
  // Additive smoothing with α = 1/20 flattens the source distribution:
  //   target_share_s = (share_s + α) / (1 + K·α)
  // Rearranged over chars/total with integer denominators:
  //   actual = chars/total
  //   target = (20·chars + total) / ((20+K)·total)
  //   factor = target/actual = (20·chars + total) / ((20+K)·chars)
  private val mixWeights = QueryDef(
    "q_mix_weights",
    (s, d) => {
      import s.implicits._
      val perSource = Tables.documents(s, d)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_chars".cast("long")).as("total_chars"))
      val w = Window.partitionBy()
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(28,2)")
      perSource
        .withColumn("total", sum($"total_chars").over(w))
        .withColumn("k", count(lit(1)).over(w))
        .select($"source", $"n_docs", $"total_chars",
          round(dec($"total_chars") / $"total", 6)
            .cast("decimal(38,6)").cast("double").as("actual_share"),
          round(dec($"total_chars" * 20 + $"total") / (($"k" + 20) * $"total"), 6)
            .cast("decimal(38,6)").cast("double").as("target_share"),
          round(dec($"total_chars" * 20 + $"total") / (($"k" + 20) * $"total_chars"), 6)
            .cast("decimal(38,6)").cast("double").as("sampling_factor"))
        .orderBy($"source")
    },
    Some("""WITH per_source AS (
        SELECT source, count(*) AS n_docs,
          CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY source),
      t AS (SELECT *, sum(total_chars) OVER () AS total,
                   count(*) OVER () AS k FROM per_source)
      SELECT source, n_docs, total_chars,
        CAST(CAST(round(CAST(total_chars AS DECIMAL(28,2)) / total, 6) AS DECIMAL(38,6)) AS DOUBLE) AS actual_share,
        CAST(CAST(round(CAST(total_chars * 20 + total AS DECIMAL(28,2)) / ((k + 20) * total), 6) AS DECIMAL(38,6)) AS DOUBLE) AS target_share,
        CAST(CAST(round(CAST(total_chars * 20 + total AS DECIMAL(28,2)) / ((k + 20) * total_chars), 6) AS DECIMAL(38,6)) AS DOUBLE) AS sampling_factor
      FROM t ORDER BY source"""),
    "Domain-mixture rebalancing: per-source shares, additive-smoothed " +
      "target mixture, up/down-sampling factors — exact decimal")

  // ----------------------------------------------- q_mix_sample
  // EXECUTE the mixture plan: per-document copy counts that realize
  // q_mix_weights' sampling factors deterministically (the step between
  // deciding a mixture and materializing the training corpus). A doc in
  // source s with factor f gets floor(f) copies plus one more iff its
  // hash residue falls below frac(f) — so the expected per-source mass
  // hits the target share exactly, and the decision derives from the
  // DATA (md5 of doc_id + salt), not RNG state: reproducible across
  // engines, restarts, and repartitionings (the q_sample_split rule).
  //
  // Scale shape: the factor table is domain-cardinality-sized (broadcast
  // after one corpus aggregation); the copy decision is a pure map over
  // the corpus — zero corpus shuffle before the presentation sort. The
  // factor is carried in integer MILLIONTHS (f_mil, the exact decimal
  // the weights op publishes ×10⁶), so floor/frac arithmetic is
  // integer-exact on both engines.
  /** The per-document copy-count relation both mixture executors share:
    * (doc_id, source, n_chars, f_mil, n_copies) — q_mix_sample publishes
    * it, q_mix_execute explodes it into the realized corpus. */
  private def copyCounts(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy()
    val factors = Tables.documents(s, d)
      .groupBy($"source")
      .agg(sum($"n_chars".cast("long")).as("total_chars"))
      .withColumn("total", sum($"total_chars").over(w))
      .withColumn("k", count(lit(1)).over(w))
      .select($"source",
        (round(($"total_chars" * 20 + $"total").cast("decimal(28,2)") /
            (($"k" + 20) * $"total_chars"), 6)
          .cast("decimal(38,6)") * 1000000L).cast("long").as("f_mil"))
    // residue in [0, 1e6): first 8 hex digits of md5(doc_id:mix:42)
    val residue = pmod(
      conv(substring(md5(concat($"doc_id".cast("string"), lit(":mix:42"))),
        1, 8), 16, 10).cast("long"), lit(1000000L))
    Tables.documents(s, d)
      .select($"doc_id", $"source", $"n_chars".cast("long").as("n_chars"))
      .join(broadcast(factors), "source")
      .select($"doc_id", $"source", $"n_chars", $"f_mil",
        (floor($"f_mil" / 1000000L) +
          when(residue < $"f_mil" % 1000000L, 1L).otherwise(0L))
          .cast("long").as("n_copies"))
  }

  private val mixSample = QueryDef(
    "q_mix_sample",
    (s, d) => {
      import s.implicits._
      copyCounts(s, d)
        .select($"doc_id", $"source", $"f_mil", $"n_copies")
        .orderBy($"doc_id")
    },
    Some("""WITH per_source AS (
        SELECT source, CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY source),
      f AS (SELECT source,
          CAST(CAST(round(CAST(total_chars * 20 + total AS DECIMAL(28,2))
              / ((k + 20) * total_chars), 6) AS DECIMAL(38,6)) * 1000000
            AS BIGINT) AS f_mil
        FROM (SELECT *, CAST(sum(total_chars) OVER () AS BIGINT) AS total,
                CAST(count(*) OVER () AS BIGINT) AS k FROM per_source)),
      r AS (SELECT doc_id, source,
          CAST(list_sum(list_transform(range(1, 9), i ->
              (strpos('0123456789abcdef',
                substr(md5(CAST(doc_id AS VARCHAR) || ':mix:42'), i, 1)) - 1)
                * (16 ** (8 - i))))
            AS BIGINT) % 1000000 AS residue
        FROM documents)
      SELECT r.doc_id, r.source, f.f_mil,
        CAST(f.f_mil // 1000000
          + CASE WHEN r.residue < f.f_mil % 1000000 THEN 1 ELSE 0 END
          AS BIGINT) AS n_copies
      FROM r JOIN f USING (source)
      ORDER BY r.doc_id"""),
    "Mixture-plan execution: deterministic per-doc copy counts realizing " +
      "the rebalancing factors (floor + hash-residue fractional copy), " +
      "domain-sized factor broadcast, zero corpus shuffle")

  // ----------------------------------------------- q_mix_execute
  // MATERIALIZE the mixture (VERDICT r10 task 4): explode each document
  // into its n_copies rows with a per-copy index — the actual resampled
  // training corpus a shard writer would consume downstream (the copy
  // index keys shard assignment / per-epoch shuffling; the text column
  // joins back by doc_id at write time, so the resample relation itself
  // stays metadata-narrow).
  //
  // Scale shape: the explode is a bounded Generate — amplification per
  // row is n_copies ≤ ⌈f⌉, and the smoothing algebra caps f at
  // (20·chars_s + total)/((20+K)·chars_s); total output mass is exactly
  // the target mixture's, ≈ the input corpus size. Zero-copy docs
  // (downsampled out by the hash residue) are filtered BEFORE the
  // Generate. No corpus shuffle before the presentation sort, and
  // sequence() never sees an empty range (Spark's default step would
  // flip to -1 for n_copies = 0 and emit a phantom [1,0] pair).
  private val mixExecute = QueryDef(
    "q_mix_execute",
    (s, d) => {
      import s.implicits._
      copyCounts(s, d)
        .filter($"n_copies" > 0)
        .select($"doc_id", $"source", $"n_chars",
          explode(sequence(lit(1L), $"n_copies")).as("copy_idx"))
        .select($"doc_id", $"copy_idx", $"source", $"n_chars")
        .orderBy($"doc_id", $"copy_idx")
    },
    Some("""WITH per_source AS (
        SELECT source, CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY source),
      f AS (SELECT source,
          CAST(CAST(round(CAST(total_chars * 20 + total AS DECIMAL(28,2))
              / ((k + 20) * total_chars), 6) AS DECIMAL(38,6)) * 1000000
            AS BIGINT) AS f_mil
        FROM (SELECT *, CAST(sum(total_chars) OVER () AS BIGINT) AS total,
                CAST(count(*) OVER () AS BIGINT) AS k FROM per_source)),
      r AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
          CAST(list_sum(list_transform(range(1, 9), i ->
              (strpos('0123456789abcdef',
                substr(md5(CAST(doc_id AS VARCHAR) || ':mix:42'), i, 1)) - 1)
                * (16 ** (8 - i))))
            AS BIGINT) % 1000000 AS residue
        FROM documents),
      n AS (SELECT r.doc_id, r.source, r.n_chars,
          CAST(f.f_mil // 1000000
            + CASE WHEN r.residue < f.f_mil % 1000000 THEN 1 ELSE 0 END
            AS BIGINT) AS n_copies
        FROM r JOIN f USING (source))
      SELECT doc_id, CAST(unnest(range(1, n_copies + 1)) AS BIGINT) AS copy_idx,
        source, n_chars
      FROM n WHERE n_copies > 0
      ORDER BY doc_id, copy_idx"""),
    "Materialized mixture: each doc exploded n_copies times with a " +
      "per-copy index — the realized resampled training corpus, bounded " +
      "Generate, zero corpus shuffle")

  // ----------------------------------------------- q_text_chunk
  // Fixed-context chunking with overlap: L-token windows, stride L−O, a
  // short final window keeping the tail. chunk i covers token indices
  // [i·stride, min(i·stride+L, n)) and — since round 10 (VERDICT r9
  // task 6) — carries the chunk TEXT itself, so the op yields a
  // trainable corpus, not just geometry. The chunk rows come out of the
  // one-pass [[graft.functions.ChunkText]] codegen kernel (tokenize
  // once, emit exactly the output bytes); the declarative alternatives
  // either copy the whole token array into every chunk row via the
  // Generate (O(n²/stride) bytes per doc) or re-tokenize per slice
  // after lambda inlining — both quadratic walls for book-length docs.
  private[graft] val ChunkLen = 128
  private[graft] val ChunkOverlap = 32
  private[graft] val ChunkStride = ChunkLen - ChunkOverlap // 96

  private val textChunk = QueryDef(
    "q_text_chunk",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id",
          explode(graft.functions.ChunkText.chunk_text(
            $"text", ChunkLen, ChunkOverlap)).as("c"))
        .select($"doc_id", $"c.chunk_idx", $"c.start_tok", $"c.end_tok",
          ($"c.end_tok" - $"c.start_tok").as("chunk_len"), $"c.chunk_text")
        .orderBy($"doc_id", $"chunk_idx")
    },
    Some(s"""WITH t AS (
        SELECT doc_id,
          list_filter(regexp_split_to_array(lower(text), ' +'),
            x -> x <> '') AS tk
        FROM documents),
      c AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n_tok,
          CASE WHEN len(tk) <= $ChunkLen THEN 1
               ELSE 1 + CAST(floor((len(tk) - $ChunkLen + $ChunkStride - 1)
                                   / $ChunkStride.0) AS BIGINT) END AS nc
        FROM t WHERE len(tk) > 0),
      ch AS (SELECT doc_id, tk, n_tok, unnest(range(0, nc)) AS chunk_idx FROM c)
      SELECT doc_id, chunk_idx,
        chunk_idx * $ChunkStride AS start_tok,
        least(chunk_idx * $ChunkStride + $ChunkLen, n_tok) AS end_tok,
        least(chunk_idx * $ChunkStride + $ChunkLen, n_tok)
          - chunk_idx * $ChunkStride AS chunk_len,
        array_to_string(tk[CAST(chunk_idx * $ChunkStride + 1 AS BIGINT):
          CAST(least(chunk_idx * $ChunkStride + $ChunkLen, n_tok) AS BIGINT)],
          ' ') AS chunk_text
      FROM ch ORDER BY doc_id, chunk_idx"""),
    s"Context-window chunking: $ChunkLen-token windows, $ChunkOverlap" +
      "-token overlap, tail-preserving, chunk text included — one-pass " +
      "codegen kernel + bounded explode")

  override def defs: Seq[QueryDef] =
    Seq(mixWeights, mixSample, mixExecute, textChunk)
}
