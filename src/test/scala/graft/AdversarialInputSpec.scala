package graft

import org.apache.spark.sql.functions._

/** Adversarial-input hardening for the text/dedup tier (VERDICT r6 task 6).
  *
  * The fixture corpus is well-formed; 100 TB corpora are not. This spec
  * builds an edge corpus — empty docs, 1-token docs, whitespace-only, a
  * >64 KiB single line, ill-formed/unusual Unicode (lone-surrogate
  * replacement, NUL and control bytes, 4-byte emoji, RTL, CJK with no
  * spaces), punctuation-only, and a 50-copy identical-document block (the
  * df=N hot-shingle worst case in miniature) — writes it as
  * `documents.parquet` in a scratch dir, and runs EVERY declared
  * text/dedup/clean-pipeline query over it, asserting completion plus
  * semantic invariants on the known-edge rows.
  *
  * Found limits are documented at the assertion site, not hidden.
  */
class AdversarialInputSpec extends SparkTestBase {
  import spark.implicits._

  /** (doc_id, text) edge rows; ids start at 1000 so the identical block
    * 2000-2049 is disjoint. */
  private val bigLine = ("lorem ipsum dolor sit amet " * 2600).trim // ~70 KiB, no newline
  private val edgeRows: Seq[(Long, String)] = Seq(
    1000L -> "", // empty
    1001L -> "hello", // single token
    1002L -> "   \t   ", // whitespace-only
    1003L -> bigLine, // >64 KiB single line
    1004L -> "\uFFFD \u0000\u0007 caf\u00e9 \uD83D\uDE00\uD83D\uDE00", // replacement char, NUL + BEL bytes, 4-byte emoji
    1005L -> "שלום مرحبا", // RTL scripts
    1006L -> "今日は世界。今日は世界。", // CJK, no spaces
    1007L -> "!!! ??? ... ;;; ---", // punctuation-only tokens
    1008L -> "a", // 1-char
    1009L -> ("x " * 40000).trim // 40k identical 1-char tokens (repetition bomb)
  ) ++ (0 until 50).map(i => // df=N block: 50 byte-identical docs
    (2000L + i) -> "the quick brown fox jumps over the lazy dog again and again")

  private lazy val edgeDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_edge_corpus").toString
    edgeRows.toDF("doc_id", "text")
      .select($"doc_id", $"text",
        lit("xx").as("lang"), lit("edge").as("source"),
        length($"text").cast("long").as("n_chars"))
      .coalesce(2)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private val tier = Seq(
    "q_text_analysis", "q_text_quality", "q_text_langid", "q_text_tokens",
    "q_text_token_ids", "q_text_fingerprint", "q_text_fingerprint_winnow",
    "q_text_repetition", "q_text_gopher", "q_text_gopher_lines",
    "q_text_boilerplate",
    "q_text_heavy_hitters",
    "q_dedup_exact", "q_dedup_ngram_jaccard", "q_dedup_minhash",
    "q_dedup_simhash", "q_pipeline_clean", "q_sample_split",
    "q_dedup_components", "q_text_span_dedup", "q_dedup_incremental",
    "q_dedup_bloom_bands",
    "q_text_salient_terms", "q_text_bpe", "q_text_bpe_ids",
    "q_text_quality_model", "q_text_chunk", "q_mix_weights",
    "q_bpe_vocab", "q_pack_bpe", "q_bpe_encode", "q_dsir_weights",
    "q_vocab_coverage", "q_mix_sample", "q_train_classifier",
    "q_text_unigram", "q_text_unigram_ids",
    "q_unigram_vocab", "q_unigram_vocab_audit",
    "q_unigram_encode", "q_unigram_encode_audit",
    // round-10 retrieval/graph/profiling tier (documents-only inputs)
    "q_search_index", "q_search_term", "q_search_phrase",
    "q_graph_pagerank", "q_profile_drift")

  test("every text/dedup query completes on the edge corpus") {
    val failures = tier.flatMap { name =>
      try {
        SparkEntry.queries(name)(spark, edgeDir).collect(); None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${
          Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" ")}")
      }
    }
    assert(failures.isEmpty,
      s"edge corpus broke ${failures.size} queries:\n${failures.mkString("\n")}")
  }

  test("BPE local learner matches the distributed reference on ill-formed unicode") {
    // the driver-local loop's code-point symbols and UTF-8-byte
    // tie-breaks must agree with the engine formulation (substring
    // code-point indexing, binary string collation) EXACTLY where text
    // gets hostile: 4-byte emoji (non-BMP — a toCharArray split would
    // halve them into surrogates), CJK with no spaces, RTL scripts,
    // NUL/control bytes, and the 40k-token repetition bomb
    val (mL, dL) = operators.BpeOps.learnBpeUncached(spark, edgeDir)
    val (mD, dD) = operators.BpeOps.learnBpeDistributedReference(spark, edgeDir)
    assert(mL === mD, "merge tables (pairs + counts) must match")
    def dump(df: org.apache.spark.sql.DataFrame) = df
      .select($"word", $"freq", concat_ws("", $"toks").as("tk"), $"n_tok")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(dump(dL) === dump(dD), "tokenized dicts must match")
  }

  test("edge semantics: empty/whitespace docs tokenize to zero, big line survives") {
    val toks = SparkEntry.queries("q_text_tokens")(spark, edgeDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    // split("", " +") yields [""], which the engine must NOT count as a
    // token; same for whitespace-only (leading-empty artifact of split)
    assert(toks(1000L).getAs[Int]("n_bpe_tokens") === 0)
    assert(toks(1002L).getAs[Int]("n_bpe_tokens") === 0)
    assert(toks(1001L).getAs[Int]("n_ws_tokens") === 1)
    // the 70 KiB single-line doc is processed, not truncated
    assert(toks(1003L).getAs[Int]("n_chars") === bigLine.length)
    assert(toks(1009L).getAs[Int]("n_ws_tokens") === 40000)
    assert(toks(1009L).getAs[Int]("n_distinct") === 1)
  }

  test("edge semantics: the index bounds the df=N block's postings head " +
      "and pagerank spreads the clique's mass uniformly") {
    import graft.operators.SearchOps
    val idx = SparkEntry.queries("q_search_index")(spark, edgeDir)
      .select($"term", $"df", $"postings").as[(String, Long, String)]
      .collect().map { case (t, d, p) => t -> ((d, p)) }.toMap
    // 'the' appears in all 50 identical docs (df >= 50) but its postings
    // head must still be IndexTopP entries — the bounded-buffer guarantee
    // exercised at df >> P
    val (dfThe, postings) = idx("the")
    assert(dfThe >= 50L)
    assert(postings.split(",").length == SearchOps.IndexTopP)
    // the 40k-token repetition bomb is ONE doc: cf huge, df small
    val (dfX, postX) = idx("x")
    assert(dfX === 1L && postX.startsWith("1009:40000"))
    // pagerank over the 50-clique: every member has the same degree and
    // the same rank (symmetry), and the clique carries all the mass
    val pr = SparkEntry.queries("q_graph_pagerank")(spark, edgeDir)
      .as[(Long, Long, Long)].collect()
    val clique = pr.filter(r => r._1 >= 2000L && r._1 < 2050L)
    assert(clique.length === 50)
    assert(clique.map(_._2).distinct.length === 1, "clique degrees equal")
    assert(clique.map(_._3).distinct.length === 1, "clique ranks equal")
  }

  test("edge semantics: unigram audits stay green on a non-BMP corpus " +
      "(code-point audit parity, ADVICE r11)") {
    // doc 1004 carries 4-byte emoji (astral, surrogate pair in UTF-16).
    // Spark's length()/substring() and DuckDB's len()/[i:i] both count
    // CODE POINTS, and the driver-local learner splits on code points —
    // so the alphabet/shape/fallback flags must hold even where a
    // UTF-16 (toCharArray) formulation would halve the emoji into
    // unpaired surrogates and flag a correct run.
    val va = SparkEntry.queries("q_unigram_vocab_audit")(spark, edgeDir)
      .collect().head
    for (c <- Seq("alphabet_exact_ok", "size_ok", "ranks_dense_ok",
        "counts_positive_ok", "shape_ok"))
      assert(va.getAs[Long](c) === 1L, s"vocab audit flag $c")
    val ea = SparkEntry.queries("q_unigram_encode_audit")(spark, edgeDir)
      .collect().head
    for (c <- Seq("round_trip_ok", "base_vocab_ok", "fallback_count_ok"))
      assert(ea.getAs[Long](c) === 1L, s"encode audit flag $c")
  }

  test("edge semantics: exact dedup collapses the 50-copy block to one keeper") {
    val groups = SparkEntry.queries("q_dedup_exact")(spark, edgeDir).collect()
    val block = groups.filter(_.getAs[Long]("n_copies") === 50L)
    assert(block.length === 1, "exactly one 50-copy content group")
    assert(block.head.getAs[Long]("keep_doc") === 2000L, "keeper is min doc_id")
    assert(groups.length === edgeRows.size - 49, "every other doc is unique")
  }

  test("edge semantics: the identical block is a complete near-dup clique (df=N in miniature)") {
    // 50 byte-identical docs share every shingle → J=1 for all C(50,2)
    // pairs; the blocked pair kernel must emit the full clique and no
    // pair may leak OUT of the block into the edge singletons
    val pairs = SparkEntry.queries("q_dedup_ngram_jaccard")(spark, edgeDir)
      .collect()
    val inBlock = pairs.filter { r =>
      r.getAs[Long]("doc1") >= 2000L && r.getAs[Long]("doc2") >= 2000L }
    assert(inBlock.length === 50 * 49 / 2, "full clique among identical docs")
    assert(inBlock.forall(_.getAs[Double]("jaccard") === 1.0))
    assert(pairs.length === inBlock.length,
      s"no cross-block false pairs: ${pairs.length} vs ${inBlock.length}")
  }
}
