package graft.operators

import graft.{QueryDef, QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the LLM-pipeline
  * surface mandated by BASELINE.json beyond the reference's own operators.
  *
  * All tokenization is a codegen'd per-row `split`; the only shuffles are
  * the term-count aggregation (bounded by vocabulary size, tiny after
  * map-side combine) and presentation sorts. Every per-doc query is
  * embarrassingly parallel at 100 TB.
  */
object TextOps extends QueryPack {

  /** Whitespace tokenizer shared by every text operator (and mirrored
    * exactly by the DuckDB oracle via regexp_split_to_array). */
  private def toks(c: Column): Column = split(lower(c), " +")

  // ------------------------------------------------- top terms
  private val textAnalysis = QueryDef(
    "q_text_analysis",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(explode(toks($"text")).as("term"))
        .filter($"term" =!= "")
        .groupBy($"term")
        .agg(count("*").as("n"))
        .orderBy($"n".desc, $"term")
        .limit(20)
    },
    Some("""SELECT term, count(*) AS n FROM (
        SELECT unnest(regexp_split_to_array(lower(text), ' +')) AS term
        FROM documents) WHERE term <> ''
      GROUP BY term ORDER BY n DESC, term LIMIT 20"""),
    "Tokenize + explode + term frequency: top-20 corpus terms")

  // ------------------------------------------------- token counting
  private val textTokens = QueryDef(
    "q_text_tokens",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(
          $"doc_id",
          size(toks($"text")).as("n_ws_tokens"),
          // BPE-ish pre-tokenizer: word pieces OR single non-space symbols
          size(regexp_extract_all($"text", lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0)))
            .as("n_bpe_tokens"),
          size(array_distinct(toks($"text"))).as("n_distinct"),
          length($"text").as("n_chars"))
        .orderBy($"doc_id")
    },
    Some("""SELECT doc_id,
      CAST(len(regexp_split_to_array(lower(text), ' +')) AS INT) AS n_ws_tokens,
      CAST(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\s]')) AS INT) AS n_bpe_tokens,
      CAST(len(list_distinct(regexp_split_to_array(lower(text), ' +'))) AS INT) AS n_distinct,
      CAST(length(text) AS INT) AS n_chars
      FROM documents ORDER BY doc_id"""),
    "Whitespace + BPE-ish regex token counts per document")

  // ------------------------------------------------- quality scoring
  // Deterministic heuristics in exact decimal: length, lexical diversity,
  // stopword ratio — the standard cheap pre-training quality signals.
  private val textQuality = QueryDef(
    "q_text_quality",
    (s, d) => {
      import s.implicits._
      val t = toks($"text")
      val nTok = size(t).cast("long")
      val nDis = size(array_distinct(t)).cast("long")
      val stop = size(filter(t, x => x.isin("the", "a"))).cast("long")
      val ttr = round(nDis.cast("decimal(18,2)") / nTok, 6).cast("decimal(38,6)")
      val stopRatio = round(stop.cast("decimal(18,2)") / nTok, 6).cast("decimal(38,6)")
      Tables.documents(s, d)
        .select(
          $"doc_id", nTok.as("n_tokens"),
          ttr.cast("double").as("type_token_ratio"),
          stopRatio.cast("double").as("stopword_ratio"),
          // composite score: diversity minus stopword dominance, floor 0
          greatest(lit(0).cast("decimal(38,6)"),
            (ttr - stopRatio).cast("decimal(38,6)"))
            .cast("double").as("quality_score"))
        .orderBy($"doc_id")
    },
    Some("""WITH t AS (
        SELECT doc_id,
          CAST(len(regexp_split_to_array(lower(text), ' +')) AS BIGINT) AS n_tokens,
          CAST(len(list_distinct(regexp_split_to_array(lower(text), ' +'))) AS BIGINT) AS n_distinct,
          CAST(len(list_filter(regexp_split_to_array(lower(text), ' +'),
            x -> x IN ('the', 'a'))) AS BIGINT) AS n_stop
        FROM documents)
      SELECT doc_id, n_tokens,
        CAST(CAST(round(CAST(n_distinct AS DECIMAL(18,2)) / n_tokens, 6) AS DECIMAL(38,6)) AS DOUBLE) AS type_token_ratio,
        CAST(CAST(round(CAST(n_stop AS DECIMAL(18,2)) / n_tokens, 6) AS DECIMAL(38,6)) AS DOUBLE) AS stopword_ratio,
        CAST(greatest(CAST(0 AS DECIMAL(38,6)),
          CAST(CAST(round(CAST(n_distinct AS DECIMAL(18,2)) / n_tokens, 6) AS DECIMAL(38,6))
             - CAST(round(CAST(n_stop AS DECIMAL(18,2)) / n_tokens, 6) AS DECIMAL(38,6)) AS DECIMAL(38,6))) AS DOUBLE) AS quality_score
      FROM t ORDER BY doc_id"""),
    "Per-doc quality heuristics: type-token ratio, stopword ratio, score")

  // --------------------------------- model-based quality scoring
  // The CCNet/fastText-class pipeline stage (Wenzek et al. 2020; Joulin
  // et al. 2017 — public formulations): a LINEAR scorer over hashed
  // bag-of-ngram features, applied as a pure per-row map. The feature
  // hash and the weight table are both fixed public formulas so the
  // DuckDB oracle recomputes the identical score:
  //   bucket(g) = int(first 8 hex digits of md5(g)) mod 2^16
  //   w(g)      = (bucket(g) · 2654435761) mod 2001 − 1000   (Knuth's
  //               multiplicative constant; milli-units in [−1, 1])
  //   score     = Σ w(g) / (1000 · n_grams)   over word uni+bigrams
  // All arithmetic is integer until the final exact-decimal division —
  // no float summation order anywhere. ZERO shuffles: the whole scorer
  // is array expressions inside one projection; the only exchange in the
  // plan is the presentation sort. (A trained-weight deployment swaps the
  // weight formula for a broadcast lookup; the plan shape is unchanged.)
  private[operators] val QmBuckets = 65536L
  private[operators] val QmKnuth = 2654435761L
  private[operators] val QmMod = 2001L

  /** (n_grams, raw milli-score) columns for a text column — the one-pass
    * codegen kernel ([[graft.functions.QualityModelScore]]); the
    * declarative HOF formulation below is kept as the spec's
    * bit-identity reference (the Int8QuantStats precedent). */
  private[graft] def modelRawScore(text: Column): (Column, Column) = {
    val st = graft.functions.QualityModelScore.quality_model_score(toks(text))
    (st.getField("n_grams"), st.getField("raw"))
  }

  /** Declarative twin of [[modelRawScore]], used only by the spec to
    * prove the kernel bit-identical. Interpreted-HOF cost made this
    * formulation the q_pipeline_clean bottleneck at 10× (~13 s of 16 s),
    * which is why the kernel exists. */
  private[graft] def modelRawScoreDeclarative(text: Column): (Column, Column) = {
    val t = filter(toks(text), x => x =!= "")
    // bigrams via arrays_zip of two slices, NOT element_at(t, i) inside a
    // transform over indices: after CollapseProject/predicate-pushdown
    // inlining, a lambda that references `t` re-evaluates the whole
    // tokenize-and-filter expression PER ELEMENT REFERENCE — O(n²) per
    // doc (observed: 0.5 s → 18 s on q_pipeline_clean when this gate was
    // first composed in). The zip lambda touches only its own element.
    val bi = when(size(t) >= 2,
      transform(arrays_zip(
          slice(t, lit(1), size(t) - 1).as("a"),
          slice(t, lit(2), size(t) - 1).as("b")),
        p => concat_ws(" ", p.getField("a"), p.getField("b"))))
      .otherwise(array().cast("array<string>"))
    val grams = concat(t, bi)
    val wOf = (g: Column) =>
      pmod(OpHash.md5Bucket(g, QmBuckets) * QmKnuth, lit(QmMod)) - lit(1000L)
    (size(grams).cast("long"),
      aggregate(grams, lit(0L), (acc, g) => acc + wOf(g)))
  }

  /** Exact decimal(38,6) score from (n_grams, raw). Empty docs score 0. */
  private[graft] def modelScore(nGrams: Column, raw: Column): Column =
    when(nGrams > 0,
      round(raw.cast("decimal(18,2)") / (nGrams * 1000L), 6))
      .otherwise(lit(0)).cast("decimal(38,6)")

  /** The DuckDB mirror of the full scorer, as a scalar SQL expression
    * over a text column reference: (n_grams, raw) pair via two exprs. */
  private[graft] def modelSqlGrams(textRef: String): String =
    s"""(list_filter(regexp_split_to_array(lower($textRef), ' +'), x -> x <> '') ||
      CASE WHEN len(list_filter(regexp_split_to_array(lower($textRef), ' +'), x -> x <> '')) >= 2
        THEN list_transform(range(1, len(list_filter(regexp_split_to_array(lower($textRef), ' +'), x -> x <> ''))),
          i -> list_filter(regexp_split_to_array(lower($textRef), ' +'), x -> x <> '')[i] || ' ' ||
               list_filter(regexp_split_to_array(lower($textRef), ' +'), x -> x <> '')[i+1])
        ELSE [] END)"""
  private[graft] def modelSqlRaw(gramsRef: String): String =
    s"""CAST(coalesce(list_sum(list_transform($gramsRef, gr ->
      ((CAST(list_sum(list_transform(range(1, 9), i ->
          (strpos('0123456789abcdef', substr(md5(gr), i, 1)) - 1) * (16 ** (8 - i))))
        AS BIGINT) % $QmBuckets) * $QmKnuth) % $QmMod - 1000)), 0) AS BIGINT)"""
  private[graft] def modelSqlScore(nRef: String, rawRef: String): String =
    s"""CASE WHEN $nRef > 0
      THEN CAST(round(CAST($rawRef AS DECIMAL(18,2)) / ($nRef * 1000), 6) AS DECIMAL(38,6))
      ELSE CAST(0 AS DECIMAL(38,6)) END"""

  private val textQualityModel = QueryDef(
    "q_text_quality_model",
    (s, d) => {
      import s.implicits._
      val (n, raw) = modelRawScore($"text")
      val sc = modelScore($"n_grams", $"raw")
      Tables.documents(s, d)
        .select($"doc_id", n.as("n_grams"), raw.as("raw"))
        .select($"doc_id", $"n_grams",
          sc.cast("double").as("score"),
          (sc >= lit(0).cast("decimal(38,6)")).cast("long").as("keep"))
        .orderBy($"doc_id")
    },
    Some(s"""WITH g AS (
        SELECT doc_id, ${modelSqlGrams("text")} AS grams FROM documents),
      sc AS (
        SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
          ${modelSqlRaw("grams")} AS raw
        FROM g)
      SELECT doc_id, n_grams,
        CAST(${modelSqlScore("n_grams", "raw")} AS DOUBLE) AS score,
        CAST(CASE WHEN ${modelSqlScore("n_grams", "raw")} >= 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
      FROM sc ORDER BY doc_id"""),
    "Model-based quality filter: linear scorer over hashed uni+bigram " +
      "features (fixed public weight formula), zero-shuffle per-row map")

  // ------------------------------------------------- language/profile ID
  // N-gram-profile classifier: score each document against small token
  // profiles, argmax with lexicographic tie-break. (The fixture's `lang`
  // column is uncorrelated with its synthetic vocabulary, so profiles are
  // topic-shaped; the operator structure is the standard langid heuristic.)
  private val profiles: Seq[(String, Seq[String])] = Seq(
    "db"     -> Seq("scan", "join", "sort", "query", "table", "index"),
    "stream" -> Seq("stream", "window", "batch", "spark"),
    "misc"   -> Seq("the", "a", "fast", "slow", "small", "big"))

  private val textLangId = QueryDef(
    "q_text_langid",
    (s, d) => {
      import s.implicits._
      val t = toks($"text")
      def score(words: Seq[String]): Column =
        size(filter(t, x => x.isin(words.map(lit(_)): _*))).cast("long")
      val scored = Tables.documents(s, d).select(
        $"doc_id",
        score(profiles(0)._2).as("s_db"),
        score(profiles(1)._2).as("s_stream"),
        score(profiles(2)._2).as("s_misc"))
      scored.select(
        $"doc_id", $"s_db", $"s_stream", $"s_misc",
        when($"s_db" >= $"s_stream" && $"s_db" >= $"s_misc", "db")
          .when($"s_stream" >= $"s_misc", "stream")
          .otherwise("misc").as("pred"))
        .orderBy($"doc_id")
    },
    Some("""WITH t AS (
        SELECT doc_id, regexp_split_to_array(lower(text), ' +') AS w FROM documents),
      s AS (
        SELECT doc_id,
          CAST(len(list_filter(w, x -> x IN ('scan','join','sort','query','table','index'))) AS BIGINT) AS s_db,
          CAST(len(list_filter(w, x -> x IN ('stream','window','batch','spark'))) AS BIGINT) AS s_stream,
          CAST(len(list_filter(w, x -> x IN ('the','a','fast','slow','small','big'))) AS BIGINT) AS s_misc
        FROM t)
      SELECT doc_id, s_db, s_stream, s_misc,
        CASE WHEN s_db >= s_stream AND s_db >= s_misc THEN 'db'
             WHEN s_stream >= s_misc THEN 'stream'
             ELSE 'misc' END AS pred
      FROM s ORDER BY doc_id"""),
    "Profile-scoring classifier (langid heuristic shape): argmax token hits")

  // ------------------------------------------------- fingerprinting
  // Word-order-invariant content fingerprint: md5 of the sorted distinct
  // token bag. Group size attached via a window over the fingerprint —
  // shuffle is on the fingerprint key, groups are dup-cluster sized.
  private val textFingerprint = QueryDef(
    "q_text_fingerprint",
    (s, d) => {
      import s.implicits._
      val fp = md5(array_join(array_sort(array_distinct(toks($"text"))), " "))
      Tables.documents(s, d)
        .select($"doc_id", fp.as("fingerprint"))
        .withColumn("group_size",
          count("*").over(Window.partitionBy($"fingerprint")))
        .orderBy($"doc_id")
    },
    Some("""WITH f AS (
        SELECT doc_id,
          md5(array_to_string(list_sort(list_distinct(
            regexp_split_to_array(lower(text), ' +'))), ' ')) AS fingerprint
        FROM documents)
      SELECT doc_id, fingerprint,
        count(*) OVER (PARTITION BY fingerprint) AS group_size
      FROM f ORDER BY doc_id"""),
    "Order-invariant document fingerprint (md5 of sorted token set)")

  // ------------------------------------- rolling-hash winnow fingerprint
  // Schleimer et al. 2003 winnowing (the MOSS fingerprint): Rabin-Karp
  // rolling hash over k=24-byte windows, winnow window w=8 — any shared
  // substring of >= 31 bytes guarantees a shared fingerprint. (k is
  // sized to ~4 words: the fixture's 31-word vocabulary makes shorter
  // byte windows collide across unrelated docs, exploding the
  // fingerprint join the same way hot shingles would.) Custom
  // expression (graft.functions.RollingWinnow); no SQL oracle (the spec
  // recomputes the kernel independently), but the derived near-dup
  // pairing below is cross-checked against the exact n-gram Jaccard
  // pairs. The pair join is an inverted index on fingerprints — same
  // scale shape as the shingle join.
  /** The winnowed-fingerprint containment pair set (audit subject). */
  private[graft] def winnowPairs(s: SparkSession, d: String,
      bound: Option[Int] = None): DataFrame = {
      import s.implicits._
      import graft.functions.RollingWinnow.rolling_winnow
      val fps = bound.fold(Tables.documents(s, d))(b =>
          Tables.documents(s, d).filter($"doc_id" < b))
        .select($"doc_id", rolling_winnow(lower($"text"), 24, 8).as("fp"))
        .filter(size($"fp") > 0).cache()
      // join-free pair stream, same kernel as the shingle index: group
      // the inverted fingerprint index by hash, emit ordered pairs via
      // the OrderedPairs generator with the containment denominator
      // (n_fp) already on every pair row — no posting self-join and no
      // joins back to a counts table (the shape that survives 100 TB;
      // see DedupOps.ngramJaccardPairs for the broadcast-misestimate
      // hazard this avoids)
      val byHash = fps
        .select(struct($"doc_id", size($"fp").cast("long").as("n_fp")).as("dn"),
          explode($"fp").as("h"))
        .groupBy($"h")
        .agg(sort_array(collect_list($"dn")).as("docs"))
      byHash
        .select(graft.functions.OrderedPairs.ordered_pairs($"docs")
          .as(Seq("doc1", "n1", "doc2", "n2")))
        .filter($"doc1" =!= $"doc2") // same-doc repeats of one fingerprint
        .groupBy($"doc1", $"n1", $"doc2", $"n2")
        .agg(count("*").as("shared"))
        .select($"doc1", $"doc2",
          round($"shared".cast("decimal(18,2)") / least($"n1", $"n2"), 6)
            .cast("decimal(38,6)").as("containment"))
        .filter($"containment" >= lit("0.5").cast("decimal(38,6)"))
        .orderBy($"doc1", $"doc2")
        .withColumn("containment", $"containment".cast("double"))
  }

  private val textWinnow = QueryDef(
    "q_text_fingerprint_winnow",
    (s, d) => winnowPairs(s, d),
    None,
    "Winnowed rolling-hash fingerprint near-dup pairs (MOSS-style)")

  // ------------------------------------------- dictionary encoding
  // The canonical LLM-pipeline step: corpus vocabulary (top-N terms by
  // frequency, ties broken lexically) → token-id lookup via a BROADCAST
  // join (the vocab is bounded, the corpus is not) → per-doc id sequence
  // reassembled in token order. The single-partition vocab window is
  // bounded by vocabulary size, never corpus size; everything touching
  // the corpus is map-side or one grouped shuffle on doc_id.
  private val textTokenIds = QueryDef(
    "q_text_token_ids",
    (s, d) => {
      import s.implicits._
      val tokens = Tables.documents(s, d)
        .select($"doc_id", posexplode(toks($"text")))
        .toDF("doc_id", "pos", "term")
        .filter($"term" =!= "")
      val vocab = tokens.groupBy($"term").agg(count("*").as("cnt"))
        // top-N FIRST via orderBy+limit (TakeOrdered: per-partition heaps,
        // no global sort of the full vocabulary) — the single-partition
        // row_number window then runs over at most N rows, never the
        // whole term domain
        .orderBy($"cnt".desc, $"term").limit(1000)
        .withColumn("token_id",
          row_number().over(Window.orderBy($"cnt".desc, $"term")))
        .select($"term", $"token_id")
      tokens.join(broadcast(vocab), Seq("term"), "left")
        .withColumn("tid", coalesce($"token_id", lit(0)))
        .groupBy($"doc_id")
        .agg(
          count("*").as("n_tokens"),
          sum(($"tid" === 0).cast("long")).as("n_oov"),
          array_join(
            transform(array_sort(collect_list(struct($"pos", $"tid"))),
              x => x.getField("tid").cast("string")), ",").as("ids_str"))
        .orderBy($"doc_id")
    },
    Some("""WITH w AS (
        SELECT doc_id, regexp_split_to_array(lower(text), ' +') AS tk FROM documents),
      t AS (SELECT doc_id, unnest(tk) AS term, generate_subscripts(tk, 1) AS pos FROM w),
      tf AS (SELECT * FROM t WHERE term <> ''),
      v AS (SELECT term, CAST(row_number() OVER (ORDER BY count(*) DESC, term) AS INT) AS token_id
            FROM tf GROUP BY term QUALIFY token_id <= 1000),
      j AS (SELECT tf.doc_id, tf.pos, coalesce(v.token_id, 0) AS tid
            FROM tf LEFT JOIN v USING (term))
      SELECT doc_id, count(*) AS n_tokens,
        CAST(sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        array_to_string(list(CAST(tid AS VARCHAR) ORDER BY pos), ',') AS ids_str
      FROM j GROUP BY doc_id ORDER BY doc_id"""),
    "Dictionary encoding: frequency vocab -> broadcast token-id lookup " +
      "-> ordered per-doc id sequences")

  // ------------------------------------- in-doc repetition (Gopher-style)
  // The published repetition quality filters (Gopher §A1.1: "fraction of
  // duplicate n-grams") as a pure per-row map: total n-grams is
  // len - n + 1, distinct n-grams come from the one-pass WordNGrams
  // kernel, so no explode and no shuffle except the presentation sort —
  // embarrassingly parallel at 100 TB.
  private val textRepetition = QueryDef(
    "q_text_repetition",
    (s, d) => {
      import s.implicits._
      val t = toks($"text")
      val nTok = size(t).cast("long")
      def dupRatio(n: Int) = {
        val total = nTok - (n - 1)
        val distinctN = size(graft.functions.WordNGrams.word_ngrams(t, n))
          .cast("long")
        round((total - distinctN).cast("decimal(18,2)") / total, 6)
          .cast("decimal(38,6)")
      }
      val r3 = dupRatio(3)
      Tables.documents(s, d)
        .filter(size(t) >= lit(3))
        .select(
          $"doc_id", nTok.as("n_tokens"),
          dupRatio(2).cast("double").as("dup_bigram_ratio"),
          r3.cast("double").as("dup_trigram_ratio"),
          // Gopher-style reject flag, decided on the exact decimal
          (r3 > lit("0.5").cast("decimal(38,6)")).as("repetitive"))
        .orderBy($"doc_id")
    },
    Some("""WITH w AS (
        SELECT doc_id, regexp_split_to_array(lower(text), ' +') AS w FROM documents),
      g AS (
        SELECT doc_id,
          CAST(len(w) AS BIGINT) AS n_tokens,
          CAST(len(w) - 1 AS BIGINT) AS tot2,
          CAST(len(w) - 2 AS BIGINT) AS tot3,
          CAST(len(list_distinct(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1]))) AS BIGINT) AS dis2,
          CAST(len(list_distinct(list_transform(range(1, len(w) - 1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS BIGINT) AS dis3
        FROM w WHERE len(w) >= 3)
      SELECT doc_id, n_tokens,
        CAST(CAST(round(CAST(tot2 - dis2 AS DECIMAL(18,2)) / tot2, 6) AS DECIMAL(38,6)) AS DOUBLE) AS dup_bigram_ratio,
        CAST(CAST(round(CAST(tot3 - dis3 AS DECIMAL(18,2)) / tot3, 6) AS DECIMAL(38,6)) AS DOUBLE) AS dup_trigram_ratio,
        CAST(round(CAST(tot3 - dis3 AS DECIMAL(18,2)) / tot3, 6) AS DECIMAL(38,6)) > 0.5 AS repetitive
      FROM g ORDER BY doc_id"""),
    "Gopher-style duplicate-n-gram ratios: per-row map, zero data shuffles")

  // ----------------------------- Gopher document-level rule filter
  // The published Gopher quality rules (Rae et al. 2021, Appendix A —
  // the same set Dolma/RefinedWeb reuse), document-level subset: word
  // count bounds, mean word length bounds, alphabetic-word fraction,
  // symbol-to-word ratio ('#' and '...'), and the required-word rule
  // (>= 2 distinct of a language-specific function-word list — Gopher's
  // own list is English-specific in exactly this way; here it is
  // parameterized to the corpus vocabulary). The two LINE-ratio rules
  // (bullet starts, ellipsis ends) need multi-line text — the fixture
  // corpus is single-line — and would be the same per-row map shape.
  // All arithmetic exact (integer counts, decimal ratios), so the
  // DuckDB oracle replays bit-for-bit. Pure per-row map, zero data
  // shuffles — embarrassingly parallel at 100 TB.
  private val GopherMinWords = 50L
  private val GopherMaxWords = 100000L
  private val GopherRequired = Seq("the", "a", "of", "to")

  private val textGopher = QueryDef(
    "q_text_gopher",
    (s, d) => {
      import s.implicits._
      val w = toks($"text")
      val nW = size(w).cast("long")
      // Σ word lengths == chars minus spaces (words are the non-space
      // runs) — no per-word HOF aggregation needed
      val sumLen = length(translate($"text", " ", "")).cast("long")
      val meanLen = round(sumLen.cast("decimal(18,2)") / nW, 6)
        .cast("decimal(38,6)")
      val nAlpha = size(filter(w, x => x.rlike("[a-z]"))).cast("long")
      val fracAlpha = round(nAlpha.cast("decimal(18,2)") / nW, 6)
        .cast("decimal(38,6)")
      val nHash = length($"text") - length(translate($"text", "#", ""))
      val nDots = (length($"text") -
        length(regexp_replace($"text", lit("\\.\\.\\."), lit("")))) / 3
      val symRatio = round((nHash + nDots).cast("decimal(18,2)") / nW, 6)
        .cast("decimal(38,6)")
      val nReq = GopherRequired
        .map(t => array_contains(w, t).cast("long")).reduce(_ + _)
      Tables.documents(s, d)
        .select($"doc_id", nW.as("n_words"),
          meanLen.cast("double").as("mean_word_len"),
          fracAlpha.cast("double").as("frac_alpha"),
          symRatio.cast("double").as("symbol_ratio"),
          nReq.as("n_required"),
          (nW.between(GopherMinWords, GopherMaxWords) &&
            meanLen.between(lit("3").cast("decimal(38,6)"),
              lit("10").cast("decimal(38,6)")) &&
            fracAlpha >= lit("0.8").cast("decimal(38,6)") &&
            symRatio <= lit("0.1").cast("decimal(38,6)") &&
            nReq >= 2).as("keep"))
        .orderBy($"doc_id")
    },
    Some(s"""WITH w AS (
        SELECT doc_id, text,
          regexp_split_to_array(lower(text), ' +') AS w FROM documents),
      m AS (
        SELECT doc_id,
          CAST(len(w) AS BIGINT) AS n_words,
          CAST(length(replace(text, ' ', '')) AS BIGINT) AS sum_len,
          CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha,
          CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) +
            CAST((length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS n_sym,
          ${GopherRequired.map(t =>
            s"CAST(list_contains(w, '$t') AS BIGINT)").mkString(" + ")} AS n_required
        FROM w),
      r AS (
        SELECT doc_id, n_words,
          CAST(round(CAST(sum_len AS DECIMAL(18,2)) / n_words, 6) AS DECIMAL(38,6)) AS mean_word_len,
          CAST(round(CAST(n_alpha AS DECIMAL(18,2)) / n_words, 6) AS DECIMAL(38,6)) AS frac_alpha,
          CAST(round(CAST(n_sym AS DECIMAL(18,2)) / n_words, 6) AS DECIMAL(38,6)) AS symbol_ratio,
          n_required
        FROM m)
      SELECT doc_id, n_words,
        CAST(mean_word_len AS DOUBLE) AS mean_word_len,
        CAST(frac_alpha AS DOUBLE) AS frac_alpha,
        CAST(symbol_ratio AS DOUBLE) AS symbol_ratio,
        n_required,
        (n_words BETWEEN $GopherMinWords AND $GopherMaxWords
          AND mean_word_len BETWEEN 3 AND 10
          AND frac_alpha >= 0.8 AND symbol_ratio <= 0.1
          AND n_required >= 2) AS keep
      FROM r ORDER BY doc_id"""),
    "Gopher document-level rule filter: word-count/mean-length bounds, " +
      "alpha fraction, symbol ratio, required words — exact-decimal " +
      "per-row map")

  // --------------------------- cross-doc boilerplate contamination (C4)
  // The C4/CCNet boilerplate signal: how much of a document is made of
  // shingles that are common across the corpus. One explode to the
  // inverted index, a document-frequency aggregation bounded by shingle
  // vocabulary, and a semi-join back — the common-shingle set is tiny
  // (df >= threshold), so the join back broadcasts. No pairwise work at
  // any scale.
  private val textBoilerplate = QueryDef(
    "q_text_boilerplate",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
        .select($"doc_id",
          graft.functions.WordNGrams.word_ngrams(toks($"text"), 3).as("sh"))
        .filter(size($"sh") > 0)
      val posting = docs.select($"doc_id", explode($"sh").as("shingle"))
      val common = posting.groupBy($"shingle")
        .agg(countDistinct($"doc_id").as("df"))
        .filter($"df" >= lit(20))
        .select($"shingle")
      posting
        .join(broadcast(common.withColumn("is_common", lit(1L))),
          Seq("shingle"), "left")
        .groupBy($"doc_id")
        .agg(
          count("*").as("n_shingles"),
          sum(coalesce($"is_common", lit(0L))).cast("long").as("n_common"))
        .withColumn("boilerplate_ratio",
          round($"n_common".cast("decimal(18,2)") / $"n_shingles", 6)
            .cast("decimal(38,6)").cast("double"))
        .orderBy($"doc_id")
    },
    Some("""WITH w AS (
        SELECT doc_id, regexp_split_to_array(lower(text), ' +') AS w FROM documents),
      docs AS (
        SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        FROM w WHERE len(w) >= 3),
      posting AS (SELECT doc_id, unnest(sh) AS shingle FROM docs),
      common AS (
        SELECT shingle FROM posting GROUP BY shingle
        HAVING count(DISTINCT doc_id) >= 20)
      SELECT p.doc_id,
        count(*) AS n_shingles,
        CAST(sum(CASE WHEN c.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
        CAST(CAST(round(CAST(sum(CASE WHEN c.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DECIMAL(18,2)) / count(*), 6) AS DECIMAL(38,6)) AS DOUBLE) AS boilerplate_ratio
      FROM posting p LEFT JOIN common c USING (shingle)
      GROUP BY p.doc_id ORDER BY p.doc_id"""),
    "C4-style boilerplate contamination: inverted index + df threshold + " +
      "broadcast semi-join back; no pairwise work")

  // ------------------------------------------------- heavy hitters
  // Misra–Gries frequent-items sketch (functions/FreqItemsSketch): top
  // tokens per language in ONE pass with O(capacity) state per buffer —
  // no per-token shuffle. Declared in the EXACT regime (capacity 1024 ≫
  // the fixture's 31-token vocabulary, so no decrement ever fires and the
  // sketch equals the exact count map deterministically — DuckDB-oracle-
  // able); the production sketch regime (capacity < vocabulary) is
  // driver-audited by q_text_heavy_hitters_audit's order-invariant
  // guarantee flags. At 100 TB the token domain (urls, hosts, n-grams) is
  // billions of keys: a groupBy-count shuffles all of them, while this
  // aggregate ships `capacity` counters per partition.
  private[graft] val HeavyHittersCap = 1024
  private val textHeavyHitters = QueryDef(
    "q_text_heavy_hitters",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"lang", explode(toks($"text")).as("term"))
        .filter($"term" =!= "")
        .groupBy($"lang")
        .agg(graft.functions.FreqItemsSketch
          .freq_items_sketch($"term", HeavyHittersCap).as("hh"))
        .select($"lang", posexplode($"hh"))
        .filter($"pos" < 10)
        .select($"lang", ($"pos" + 1).cast("long").as("rank"),
          $"col.item".as("term"), $"col.cnt".as("n"))
        .orderBy($"lang", $"rank")
    },
    Some("""SELECT lang,
        CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS BIGINT) AS rank,
        term, n
      FROM (
        SELECT lang, term, count(*) AS n FROM (
          SELECT lang, unnest(regexp_split_to_array(lower(text), ' +')) AS term
          FROM documents)
        WHERE term <> '' GROUP BY lang, term)
      QUALIFY rank <= 10 ORDER BY lang, rank"""),
    "Misra-Gries heavy hitters per language (exact regime; sketch regime " +
      "audited)")

  // ------------------------------------------------ salient terms
  // TF-IDF-class per-document term salience: score = tf / (df + 1),
  // top 5 terms per doc. The inverse-document-frequency weight is kept
  // RATIONAL (no log): a float ln() is the one place the classic weight
  // would leave the engine's cross-engine determinism contract (libm
  // ulp differences can flip a rounded score across a tie), and the
  // rational weight preserves the property that matters — rare terms
  // outrank common ones at equal tf. Plan shape: one scan, one keyed
  // aggregation (tf on (doc, term)), then df attached by a count window
  // over the term partition — the same join-free df idiom as the ppjoin
  // prefix path (DedupOps): no vocabulary-sized build side for the
  // planner to (mis)broadcast, no duplicated tf subtree (the join
  // formulation re-computed the whole scan+aggregate once per side) —
  // and a rank-limit window that Spark collapses to WindowGroupLimit
  // partials before its exchange.
  private val textSalientTerms = QueryDef(
    "q_text_salient_terms",
    (s, d) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
      val toks = Tables.documents(s, d)
        .select($"doc_id", explode(split(lower($"text"), " +")).as("term"))
        .filter($"term" =!= "")
      val tf = toks.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      tf.withColumn("df", count(lit(1)).over(w.partitionBy($"term")))
        .withColumn("score",
          round($"tf".cast("decimal(18,2)") / ($"df" + 1L), 6)
            .cast("decimal(38,6)"))
        .withColumn("rank", row_number().over(
          w.partitionBy($"doc_id")
            .orderBy($"score".desc, $"term".asc)))
        .filter($"rank" <= 5)
        .select($"doc_id", $"term", $"tf", $"df",
          $"score".cast("double").as("score"), $"rank".cast("long").as("rank"))
        .orderBy($"doc_id", $"rank")
    },
    Some("""WITH toks AS (
        SELECT doc_id, unnest(regexp_split_to_array(lower(text), ' +')) AS term
        FROM documents),
      tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM toks WHERE term <> '' GROUP BY 1, 2),
      df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      scored AS (
        SELECT doc_id, tf.term AS term, tf, df,
          CAST(round(CAST(tf AS DECIMAL(18,2)) / (df + 1), 6) AS DECIMAL(38,6)) AS sc
        FROM tf JOIN df USING (term)),
      ranked AS (
        SELECT doc_id, term, tf, df, sc,
          row_number() OVER (PARTITION BY doc_id ORDER BY sc DESC, term) AS rank
        FROM scored)
      SELECT doc_id, term, tf, df, CAST(sc AS DOUBLE) AS score,
        CAST(rank AS BIGINT) AS rank
      FROM ranked WHERE rank <= 5 ORDER BY doc_id, rank"""),
    "Per-doc salient terms: rational tf/(df+1) weight, top 5, " +
      "deterministic (score, term) tie-break")

  // ----------------------------- Gopher LINE-ratio rules (r11 task 5)
  // The two Gopher rules q_text_gopher skips (Rae et al. 2021 Appendix
  // A): fraction of lines starting with a bullet (≤ 0.9) and fraction
  // of lines ending with an ellipsis (≤ 0.3). The fixture corpus is
  // single-line and the generator is driver-owned, so the line view is
  // DERIVED deterministically — sentence boundaries (". ") become
  // newlines via a literal leftmost non-overlapping `replace`, which
  // Spark (UTF8String.replace) and DuckDB (replace) execute
  // identically — then split on newline, catching any REAL embedded
  // newlines a future corpus carries through the same code path. Same
  // per-row map shape as q_text_gopher: integer counts, exact decimal
  // ratios, zero data shuffles. The HOF lambdas touch only their own
  // element (the documented inlining-trap rule).
  private val textGopherLines = QueryDef(
    "q_text_gopher_lines",
    (s, d) => {
      import s.implicits._
      val ls = split(replace($"text", lit(". "), lit(".\n")), "\n")
      val nLines = size(ls).cast("long")
      val nBullet = size(filter(ls, l =>
        l.startsWith("- ") || l.startsWith("* ") ||
          l.startsWith("•"))).cast("long")
      val nEllipsis = size(filter(ls, l => l.endsWith("..."))).cast("long")
      val bulletRatio = round(nBullet.cast("decimal(18,2)") / nLines, 6)
        .cast("decimal(38,6)")
      val ellipsisRatio = round(nEllipsis.cast("decimal(18,2)") / nLines, 6)
        .cast("decimal(38,6)")
      Tables.documents(s, d)
        .select($"doc_id", nLines.as("n_lines"),
          nBullet.as("n_bullet"), nEllipsis.as("n_ellipsis"),
          bulletRatio.cast("double").as("bullet_ratio"),
          ellipsisRatio.cast("double").as("ellipsis_ratio"),
          (bulletRatio <= lit("0.9").cast("decimal(38,6)") &&
            ellipsisRatio <= lit("0.3").cast("decimal(38,6)"))
            .as("lines_ok"))
        .orderBy($"doc_id")
    },
    Some("""WITH l AS (
        SELECT doc_id,
          string_split(replace(text, '. ', '.' || chr(10)), chr(10)) AS ls
        FROM documents),
      m AS (
        SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines,
          CAST(len(list_filter(ls, x -> starts_with(x, '- ')
            OR starts_with(x, '* ')
            OR starts_with(x, '•'))) AS BIGINT) AS n_bullet,
          CAST(len(list_filter(ls, x -> ends_with(x, '...'))) AS BIGINT)
            AS n_ellipsis
        FROM l),
      r AS (
        SELECT doc_id, n_lines, n_bullet, n_ellipsis,
          CAST(round(CAST(n_bullet AS DECIMAL(18,2)) / n_lines, 6)
            AS DECIMAL(38,6)) AS bullet_ratio,
          CAST(round(CAST(n_ellipsis AS DECIMAL(18,2)) / n_lines, 6)
            AS DECIMAL(38,6)) AS ellipsis_ratio
        FROM m)
      SELECT doc_id, n_lines, n_bullet, n_ellipsis,
        CAST(bullet_ratio AS DOUBLE) AS bullet_ratio,
        CAST(ellipsis_ratio AS DOUBLE) AS ellipsis_ratio,
        (bullet_ratio <= 0.9 AND ellipsis_ratio <= 0.3) AS lines_ok
      FROM r ORDER BY doc_id"""),
    "Gopher line-ratio rules over the derived sentence-line view: " +
      "bullet-start and ellipsis-end line fractions, exact-decimal " +
      "per-row map")

  override def defs: Seq[QueryDef] =
    Seq(textAnalysis, textTokens, textQuality, textQualityModel,
      textLangId, textFingerprint, textWinnow, textTokenIds,
      textRepetition, textGopher, textGopherLines, textBoilerplate,
      textHeavyHitters, textSalientTerms)
}
