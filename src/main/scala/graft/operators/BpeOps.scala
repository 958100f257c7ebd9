package graft.operators

import graft.{QueryDef, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Subword tokenization: deterministic byte-pair encoding with a
  * corpus-learned merge table (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016 — the standard
  * tokenization stage of every LLM training pipeline; VERDICT r8 task 4).
  *
  * Scale posture — the industrial BPE-learner shape:
  *   - Learning runs on the WORD-FREQUENCY DICT, not the corpus: one
  *     corpus-sized keyed aggregation builds (word, freq), and every one
  *     of the `Merges` iterations after that touches only the vocab-sized
  *     dict (two small jobs: a pair-count aggregation and a 1-row argmax
  *     collect — the same collect-broadcast iteration pattern as
  *     [[ClusterOps]]' k-means).
  *   - Application is also dict-sized: merges rewrite the dict's symbol
  *     strings; the corpus then joins word → token-count once. The token
  *     vocabulary of a production tokenizer is O(10⁴–10⁶) entries
  *     (kilobytes–MBs), so the dict side broadcasts.
  *
  * Determinism contract (what makes an iterative text algorithm
  * DuckDB-oracle-able): the dict state is a single STRING per word — each
  * token wrapped in  delimiters, adjacent tokens abutting
  * (`␁h␁␁e␁␁y␁`) — and a merge (a,b) is a plain (non-regex) global
  * `replace` of `␁a␁␁b␁` with `␁ab␁`. Leftmost-non-overlapping
  * replacement IS greedy left-to-right BPE merge order (for a merge
  * (a,a), `[a,a,a]` → `[aa,a]`), and both engines' `replace` agree on it,
  * so the oracle replays the whole training loop in `Merges` unrolled
  * CTEs with zero float or ordering ambiguity. The argmax tie-break is
  * (count DESC, a ASC, b ASC) under binary string collation — identical
  * both sides. Input words are lowercased with the delimiter char
  * stripped (it cannot occur inside a token by construction).
  */
object BpeOps extends QueryPack {

  /** Merge-table size. Real tokenizers learn 30k–100k merges; the bound
    * here is sized to the fixture vocabulary (which collapses to
    * single-token words quickly) and to the oracle's unrolled-CTE depth —
    * the ALGORITHM is identical at any bound. */
  private[graft] val Merges = 16

  private val D = "\u0001"
  private val DD = D + D

  /** Cleaned lowercase corpus words: (doc_id, word), delimiter stripped,
    * empties dropped. */
  private def corpusWords(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", explode(split(lower($"text"), " +")).as("w0"))
      .select($"doc_id", replace($"w0", lit(D), lit("")).as("word"))
      .filter(length($"word") > 0)
  }

  /** Tokens of the current dict state `t`. */
  private def toksOf(s: SparkSession): org.apache.spark.sql.Column =
    split(expr(s"trim(BOTH char(1) FROM t)"), DD)

  /** Run the BPE learning loop: returns (ordered merge table, tokenized
    * dict (word, freq, toks array<string>, n_tok) as an eager vocab-sized
    * localCheckpoint). Driver materialization per iteration is ONE row
    * (the argmax pair) — the k-means collect-broadcast shape.
    *
    * Memoized per (Spark context, corpus dir): a corpus has ONE learned
    * tokenizer, and both declared consumers (q_text_bpe, q_text_bpe_ids)
    * plus the specs read it — the sharedNgramPairs pattern. The memo
    * holds a vocab-sized checkpoint (kilobytes at fixture scale; MBs for
    * a production tokenizer). */
  private val learnMemo = scala.collection.concurrent.TrieMap
    .empty[(String, String), (Seq[(String, String)], DataFrame)]
  private[graft] def learnBpe(s: SparkSession, d: String)
      : (Seq[(String, String)], DataFrame) =
    learnMemo.getOrElseUpdate((s.sparkContext.applicationId, d),
      learnBpeUncached(s, d))

  /** The raw loop — exposed so the determinism spec can run it twice
    * (the memoized entry point would trivially return the same object). */
  private[graft] def learnBpeUncached(s: SparkSession, d: String)
      : (Seq[(String, String)], DataFrame) = {
    import s.implicits._
    val dict0 = corpusWords(s, d)
      .groupBy($"word").agg(count(lit(1)).as("freq"))
      .withColumn("t", concat(lit(D),
        array_join(expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"), DD),
        lit(D)))
      .cache()
    var cur = dict0
    val merges = Seq.newBuilder[(String, String)]
    var exhausted = false
    for (_ <- 0 until Merges if !exhausted) {
      val sy = toksOf(s)
      val best = cur
        .select($"freq",
          explode(arrays_zip(
            slice(sy, lit(1), size(sy) - 1).as("a"),
            slice(sy, lit(2), size(sy) - 1).as("b"))).as("pr"))
        .select($"pr.a".as("a"), $"pr.b".as("b"), $"freq")
        .groupBy($"a", $"b").agg(sum($"freq").as("cnt"))
        .orderBy($"cnt".desc, $"a", $"b")
        .limit(1).as[(String, String, Long)].collect()
      if (best.isEmpty) exhausted = true // every word is one token already
      else {
        val (a, b, _) = best.head
        merges += ((a, b))
        cur = cur.withColumn("t",
          replace($"t", lit(D + a + DD + b + D), lit(D + a + b + D)))
      }
    }
    val dictTok = cur
      .select($"word", $"freq", toksOf(s).as("toks"),
        size(toksOf(s)).cast("long").as("n_tok"))
      .localCheckpoint()
    dict0.unpersist(false)
    (merges.result(), dictTok)
  }

  /** Shared DuckDB CTE suffix re-deriving the tokenized dict from the
    * unrolled training replay: exposes `dtoks(word, freq, tk)`. */
  private def dictToksCte: String =
    s"""dtoks AS MATERIALIZED (SELECT word, freq,
        string_split(trim(t, chr(1)), chr(1)||chr(1)) AS tk FROM d$Merges)"""

  // ------------------------------------------------------ q_text_bpe
  private val textBpe = QueryDef(
    "q_text_bpe",
    (s, d) => {
      import s.implicits._
      val (_, dictTok) = learnBpe(s, d)
      // token vocab broadcast (MBs for a production tokenizer); the
      // corpus word stream never shuffles — per-doc counts reuse the
      // documents partitioning via the doc_id aggregation only
      val perDoc = corpusWords(s, d)
        .join(broadcast(dictTok.select($"word", $"n_tok")), "word")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_words"), sum($"n_tok").as("n_bpe_tokens"))
      Tables.documents(s, d).select($"doc_id")
        .join(perDoc, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"n_words", lit(0L)).as("n_words"),
          coalesce($"n_bpe_tokens", lit(0L)).as("n_bpe_tokens"))
        .orderBy($"doc_id")
    },
    Some(s"""WITH $learnCtes,
      toks AS (SELECT word,
        CAST(len(string_split(trim(t, chr(1)), chr(1)||chr(1))) AS BIGINT) AS n_tok
        FROM d$Merges),
      per_doc AS (
        SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_words,
          CAST(SUM(n_tok) AS BIGINT) AS n_bpe_tokens
        FROM words w JOIN toks USING (word) GROUP BY 1)
      SELECT d.doc_id, COALESCE(p.n_words, 0) AS n_words,
        COALESCE(p.n_bpe_tokens, 0) AS n_bpe_tokens
      FROM documents d LEFT JOIN per_doc p USING (doc_id)
      ORDER BY d.doc_id"""),
    s"Deterministic BPE subword tokenization: $Merges corpus-learned " +
      "merges over the word-frequency dict, per-doc token counts")

  /** The DuckDB replay of the whole training loop — shared by both BPE
    * oracles. Every per-iteration CTE is MATERIALIZED: each level
    * references the previous one ~4 times (the dict chain plus three
    * scalar subqueries on the argmax row), so inlining would expand the
    * 16-level chain exponentially (~4^16 scans of the base table —
    * observed as a "too many open files" blow-up in DuckDB). Exposes
    * `words(doc_id, word)` and `d$Merges(word, freq, t)`. */
  private def learnCtes: String = {
    val iters = (0 until Merges).map { k =>
      s"""s$k AS MATERIALIZED (SELECT word, freq, string_split(trim(t, chr(1)), chr(1)||chr(1)) AS sy FROM d$k),
      p$k AS MATERIALIZED (SELECT a, b, SUM(freq) AS cnt FROM (
          SELECT freq, sy[i] AS a, sy[i+1] AS b FROM (
            SELECT freq, sy, unnest(range(1, len(sy))) AS i FROM s$k))
        GROUP BY 1, 2),
      b$k AS MATERIALIZED (SELECT a, b FROM p$k ORDER BY cnt DESC, a, b LIMIT 1),
      d${k + 1} AS MATERIALIZED (SELECT word, freq,
        coalesce(replace(t,
          chr(1)||(SELECT a FROM b$k)||chr(1)||chr(1)||(SELECT b FROM b$k)||chr(1),
          chr(1)||(SELECT a FROM b$k)||(SELECT b FROM b$k)||chr(1)), t) AS t
        FROM d$k)"""
    }.mkString(",\n      ")
    s"""wr AS (
        SELECT doc_id, unnest(regexp_split_to_array(lower(text), ' +')) AS w0
        FROM documents),
      words AS MATERIALIZED (
        SELECT doc_id, replace(w0, chr(1), '') AS word FROM wr
        WHERE len(replace(w0, chr(1), '')) > 0),
      dict AS (SELECT word, count(*) AS freq FROM words GROUP BY 1),
      d0 AS MATERIALIZED (SELECT word, freq,
        chr(1) || array_to_string(
          list_transform(range(1, len(word) + 1), i -> word[i:i]),
          chr(1)||chr(1)) || chr(1) AS t
        FROM dict),
      $iters"""
  }

  // -------------------------------------------------- q_text_bpe_ids
  // The tokenization story's deliverable: each document as its ordered
  // subword-ID sequence — the row a training pipeline actually feeds the
  // model. IDs are frequency ranks of the learned subword vocabulary
  // (corpus-weighted, ties lexicographic), the q_text_token_ids
  // convention one level down. Scale shape: the dict and vocab are
  // vocabulary-sized broadcasts; the corpus explodes words with
  // positions, maps word → subword ids through the broadcast dict, and
  // reassembles per doc_id in one grouped shuffle — no corpus-sized
  // relation ever joins another.
  private val VocabSize = 1000

  private val textBpeIds = QueryDef(
    "q_text_bpe_ids",
    (s, d) => {
      import s.implicits._
      val (_, dictTok) = learnBpe(s, d)
      // subword vocab: corpus-weighted token frequency (Σ word-freq over
      // occurrences), rank desc with lexicographic tie-break
      val vocab = dictTok
        .select(explode($"toks").as("tok"), $"freq")
        .groupBy($"tok").agg(sum($"freq").as("cnt"))
        .orderBy($"cnt".desc, $"tok").limit(VocabSize)
        .withColumn("tid", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy($"cnt".desc, $"tok")))
        .select($"tok", $"tid")
      val posWords = Tables.documents(s, d)
        .select($"doc_id", posexplode(split(lower($"text"), " +")))
        .toDF("doc_id", "pos", "w0")
        .select($"doc_id", $"pos", replace($"w0", lit(D), lit("")).as("word"))
        .filter(length($"word") > 0)
      val ids = posWords
        .join(broadcast(dictTok.select($"word", $"toks")), "word")
        .select($"doc_id", $"pos", posexplode($"toks"))
        .toDF("doc_id", "pos", "subpos", "tok")
        .join(broadcast(vocab), Seq("tok"), "left")
        .select($"doc_id", $"pos", $"subpos",
          coalesce($"tid", lit(0)).as("tid"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_bpe_tokens"),
          array_join(
            transform(array_sort(collect_list(struct($"pos", $"subpos", $"tid"))),
              x => x.getField("tid").cast("string")), ",").as("ids_str"))
      Tables.documents(s, d).select($"doc_id")
        .join(ids, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"n_bpe_tokens", lit(0L)).as("n_bpe_tokens"),
          coalesce($"ids_str", lit("")).as("ids_str"))
        .orderBy($"doc_id")
    },
    Some(s"""WITH $learnCtes,
      dtoks AS MATERIALIZED (SELECT word, freq,
        string_split(trim(t, chr(1)), chr(1)||chr(1)) AS tk FROM d$Merges),
      vocab AS (SELECT tok, CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS INT) AS tid
        FROM (SELECT tok, SUM(freq) AS cnt FROM (
          SELECT freq, unnest(tk) AS tok FROM dtoks) GROUP BY 1)
        QUALIFY tid <= $VocabSize),
      wr2 AS (SELECT doc_id, regexp_split_to_array(lower(text), ' +') AS tk FROM documents),
      pw AS (SELECT doc_id, replace(w0, chr(1), '') AS word, pos FROM (
          SELECT doc_id, unnest(tk) AS w0, generate_subscripts(tk, 1) AS pos FROM wr2)
        WHERE len(replace(w0, chr(1), '')) > 0),
      seq AS (SELECT p.doc_id, p.pos,
          generate_subscripts(t.tk, 1) AS subpos, unnest(t.tk) AS tok
        FROM pw p JOIN dtoks t USING (word)),
      ids AS (SELECT s.doc_id, s.pos, s.subpos, COALESCE(v.tid, 0) AS tid
        FROM seq s LEFT JOIN vocab v USING (tok)),
      per_doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bpe_tokens,
        array_to_string(list(CAST(tid AS VARCHAR) ORDER BY pos, subpos), ',') AS ids_str
        FROM ids GROUP BY doc_id)
      SELECT d.doc_id, COALESCE(p.n_bpe_tokens, 0) AS n_bpe_tokens,
        COALESCE(p.ids_str, '') AS ids_str
      FROM documents d LEFT JOIN per_doc p USING (doc_id)
      ORDER BY d.doc_id"""),
    "Per-document subword-ID sequences from the learned BPE vocabulary " +
      "(frequency-ranked ids), broadcast dict + one grouped shuffle")

  override def defs: Seq[QueryDef] = Seq(textBpe, textBpeIds)
}
