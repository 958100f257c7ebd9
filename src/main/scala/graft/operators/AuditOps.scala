package graft.operators

import graft.{QueryDef, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-visible audit companions for the algorithmic (`no_oracle`)
  * operators (VERDICT r4 task 6). Each `*_audit` query reduces its
  * subject to scalar facts a DuckDB oracle can hash-check:
  *
  *  - EXACT columns the oracle recomputes independently (distinct counts,
  *    exact percentiles, exact pair counts, ground-truth duplicate pairs);
  *  - INVARIANT flags (BIGINT 0/1) the oracle pins at 1 — recall against
  *    an exact baseline, sketch error inside its published bound. The
  *    Spark side computes the flag from the real algorithm output, so a
  *    regression (broken hash kernel, lost bucket, degraded sketch) flips
  *    the flag to 0 and the driver's hash compare goes red.
  *
  * This shrinks the spec-trust surface: the specs still prove the strong
  * per-element properties, but the driver now independently re-proves the
  * headline invariant of every approximate operator each round.
  */
object AuditOps extends QueryPack {

  // ------------------------------------------------------- HLL audit
  // approx_count_distinct(rsd=0.02): the estimate must sit within ±5%
  // (2.5 sigma) of the exact per-group distinct count.
  private val hllAudit = QueryDef(
    "q_agg_hll_audit",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"event_type")
        .agg(
          countDistinct($"user_id").as("exact_users"),
          approx_count_distinct($"user_id", 0.02).as("approx"),
          count("*").as("n_events"))
        .select($"event_type", $"exact_users", $"n_events",
          (abs($"approx" - $"exact_users") <=
            $"exact_users" * lit(0.05)).cast("long").as("hll_ok"))
        .orderBy($"event_type")
    },
    Some("""SELECT event_type, count(DISTINCT user_id) AS exact_users,
      count(*) AS n_events, CAST(1 AS BIGINT) AS hll_ok
      FROM events GROUP BY event_type ORDER BY event_type"""),
    "HLL audit: exact distinct (oracle-recomputed) + in-bound flag")

  // ------------------------------------------- sketch-rollup audit
  // The DataSketches HLL daily partials (q_agg_sketch_rollup, lgK=12):
  // every per-day estimate AND the union-of-partials total must sit
  // within ±5% of the exact distinct count (at fixture cardinalities
  // the sketch is still in exact sparse mode, so the flag has slack
  // only the algorithm breaking outright would consume). The union flag
  // is the one that matters: it proves re-aggregating PARTIALS answers
  // the total-question correctly without re-scanning raw events.
  private val sketchRollupAudit = QueryDef(
    "q_agg_sketch_rollup_audit",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).select(to_date($"ts").as("day"), $"user_id")
      // cached for the same two-branch reason as the declared query
      val daily = AggOps.dailySketches(s, d).cache()
      val perDay = daily
        .select($"day", $"n_events", hll_sketch_estimate($"sk").as("est"))
        .join(ev.groupBy($"day")
          .agg(countDistinct($"user_id").as("exact_users")), "day")
        .select(date_format($"day", "yyyy-MM-dd").as("day"),
          $"exact_users", $"n_events",
          (abs($"est" - $"exact_users") <= $"exact_users" * lit(0.05))
            .cast("long").as("est_ok"))
      val total = daily
        .agg(sum($"n_events").as("n_events"),
          hll_sketch_estimate(hll_union_agg($"sk", lit(false))).as("est"))
        .join(ev.agg(countDistinct($"user_id").as("exact_users")))
        .select(lit("total").as("day"), $"exact_users", $"n_events",
          (abs($"est" - $"exact_users") <= $"exact_users" * lit(0.05))
            .cast("long").as("est_ok"))
      perDay.unionByName(total).orderBy($"day")
    },
    Some("""SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
        CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        CAST(count(*) AS BIGINT) AS n_events, CAST(1 AS BIGINT) AS est_ok
      FROM events GROUP BY 1
      UNION ALL
      SELECT 'total', CAST(count(DISTINCT user_id) AS BIGINT),
        CAST(count(*) AS BIGINT), CAST(1 AS BIGINT)
      FROM events
      ORDER BY day"""),
    "Sketch-rollup audit: exact per-day + total distincts " +
      "(oracle-recomputed) with union-of-partials error flags")

  // ------------------------------------------- approx-percentile audit
  // GK sketch with accuracy 10000 (rank error <= n/10000): each estimate
  // must land between the exact quantiles at p ± 0.02 — a ~200x margin.
  private val pctAudit = QueryDef(
    "q_agg_percentile_approx_audit",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.5)").as("e50"),
          expr("percentile(l_quantity, 0.9)").as("e90"),
          expr("percentile(l_quantity, 0.48)").as("lo50"),
          expr("percentile(l_quantity, 0.52)").as("hi50"),
          expr("percentile(l_quantity, 0.88)").as("lo90"),
          expr("percentile(l_quantity, 0.92)").as("hi90"),
          expr("approx_percentile(l_quantity, 0.5, 10000)").as("a50"),
          expr("approx_percentile(l_quantity, 0.9, 10000)").as("a90"),
          count("*").as("n_rows"))
        .select($"l_returnflag",
          round($"e50", 6).cast("decimal(38,6)").cast("double").as("p50_exact"),
          round($"e90", 6).cast("decimal(38,6)").cast("double").as("p90_exact"),
          $"n_rows",
          ($"a50" >= $"lo50" && $"a50" <= $"hi50").cast("long").as("p50_ok"),
          ($"a90" >= $"lo90" && $"a90" <= $"hi90").cast("long").as("p90_ok"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
      CAST(CAST(round(quantile_cont(l_quantity, 0.5), 6) AS DECIMAL(38,6)) AS DOUBLE) AS p50_exact,
      CAST(CAST(round(quantile_cont(l_quantity, 0.9), 6) AS DECIMAL(38,6)) AS DOUBLE) AS p90_exact,
      count(*) AS n_rows,
      CAST(1 AS BIGINT) AS p50_ok, CAST(1 AS BIGINT) AS p90_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    "GK-sketch audit: exact quantiles (oracle-recomputed) + rank-bound flags")

  // --------------------------------------------------- MinHash audit
  // The LSH output is candidates ∩ {J >= 0.5}, hence a SUBSET of the
  // exact pair set by construction; the audit pins its RECALL: every
  // exact pair must survive banding (n_missed = 0, n_pairs = n_exact).
  // The oracle recomputes n_exact from scratch with the ngram CTE.
  //
  // The pairwise audits (minhash / simhash / winnow) run on a BOUNDED
  // deterministic window `doc_id < 1000` (VERDICT r5 task 3 — the
  // embedding audit's pattern): the exact Σ df² ground-truth recompute is
  // then a constant of the window, not of the corpus, the way a production
  // pipeline samples its recall audit. At the driver's sf0.01 correctness
  // gate the corpus is 500 docs, so the window IS the full corpus and the
  // audited invariants are unchanged; at sf0.1+ the audit cost stops
  // scaling with the corpus (~25x less pair work at sf0.1).
  private val DocAuditWindow = 1000
  private def docWindowed(cte: String): String =
    cte.replace("FROM documents", s"FROM documents WHERE doc_id < $DocAuditWindow")

  /** The exact J >= 0.5 pair set of the audit window, materialized ONCE
    * per (context, corpus) and shared by its three consumers — the
    * minhash, simhash and winnowing recall audits each recomputed the
    * full windowed shingle → blocked-pair → verify pipeline (r16; the
    * [[DedupOps.sharedNgramPairs]] factoring rule from VERDICT r8 task 3
    * applied to the audit window). presentation=false skips the
    * range-exchange sort that only exists for the declared pair dump;
    * `jaccard` stays the exact decimal, so the 0.9 near-dup threshold
    * below compares in the same domain as the oracle. */
  private val windowPairsMemo =
    new graft.Memo.Bounded[(String, String, String),
      org.apache.spark.sql.DataFrame](
      cap = 2, onEvict = graft.Memo.releaseLocalCheckpoint)
  private def windowExactPairs(s: SparkSession, d: String): DataFrame =
    windowPairsMemo.getOrElseUpdate((s.sparkContext.applicationId, d,
      graft.FixtureStamp.stamp("audpairs1", d, "documents")))(
      DedupOps.ngramJaccardPairs(s, d, prefixFilter = false,
        Some(DocAuditWindow), presentation = false)
        .localCheckpoint())

  private val minhashAudit = QueryDef(
    "q_dedup_minhash_audit",
    (s, d) => {
      import s.implicits._
      val exact = windowExactPairs(s, d)
        .select($"doc1", $"doc2", lit(1L).as("in_e"))
      val mh = DedupOps.minhashPairs(s, d, Some(DocAuditWindow))
        .select($"doc1", $"doc2", lit(1L).as("in_m"))
      exact.join(mh, Seq("doc1", "doc2"), "full_outer")
        .agg(
          coalesce(sum($"in_e"), lit(0L)).as("n_exact"),
          coalesce(sum($"in_m"), lit(0L)).as("n_pairs"),
          coalesce(sum(when($"in_m".isNull, 1L).otherwise(0L)), lit(0L))
            .as("n_missed"))
    },
    Some(docWindowed("""WITH w AS (
        SELECT doc_id, regexp_split_to_array(lower(text), ' +') AS w FROM documents),
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
      pairs AS (
        SELECT doc1, doc2 FROM inter
        JOIN counts c1 ON doc1 = c1.doc_id
        JOIN counts c2 ON doc2 = c2.doc_id
        WHERE CAST(round(CAST(i AS DECIMAL(18,2)) / (c1.n_sh + c2.n_sh - i), 6) AS DECIMAL(38,6)) >= 0.5)
      SELECT count(*) AS n_exact, count(*) AS n_pairs,
        CAST(0 AS BIGINT) AS n_missed FROM pairs""")),
    "MinHash-LSH recall audit vs the exact ngram-Jaccard pair set " +
      s"(bounded window doc_id < $DocAuditWindow)")

  // ---------------------------------------- SimHash / winnowing audits
  // Ground truth both engines can recompute: the exact n-gram Jaccard
  // pairs at J >= 0.9 (the fixture's planted near-dups — the corpus has
  // no byte-identical documents, so THIS is the real duplicate signal).
  // Each fingerprinting path must recover at least `floor` of them; the
  // measured fixture recalls (simhash 23/25, winnow 25/25 at sf0.01) sit
  // well above the floors, so the flag flips only on a real regression.
  private val NgramNearDupOracleCte = """WITH w AS (
        SELECT doc_id, regexp_split_to_array(lower(text), ' +') AS w FROM documents),
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
      nd AS (
        SELECT doc1, doc2 FROM inter
        JOIN counts c1 ON doc1 = c1.doc_id
        JOIN counts c2 ON doc2 = c2.doc_id
        WHERE CAST(round(CAST(i AS DECIMAL(18,2)) / (c1.n_sh + c2.n_sh - i), 6) AS DECIMAL(38,6)) >= 0.9)"""

  private[graft] def fingerprintRecallAudit(name: String, floor: Double,
      pairs: (SparkSession, String) => DataFrame, doc: String): QueryDef =
    QueryDef(
      name,
      (s, d) => {
        import s.implicits._
        val nd = windowExactPairs(s, d)
          .filter($"jaccard" >= lit("0.9").cast("decimal(38,6)"))
          .select($"doc1", $"doc2")
        val fp = pairs(s, d).select($"doc1", $"doc2", lit(1L).as("caught"))
        nd.join(fp, Seq("doc1", "doc2"), "left")
          .agg(count("*").as("n_neardup_pairs"),
            (coalesce(sum($"caught"), lit(0L)) >= count("*") * floor)
              .cast("long").as("recall_ok"))
      },
      Some(docWindowed(s"""$NgramNearDupOracleCte
        SELECT count(*) AS n_neardup_pairs, CAST(1 AS BIGINT) AS recall_ok
        FROM nd""")),
      doc)

  private val simhashAudit = fingerprintRecallAudit(
    "q_dedup_simhash_audit", 0.8,
    (s, d) => DedupOps.simhashPairs(s, d, Some(DocAuditWindow)),
    "SimHash recall audit vs exact ngram J>=0.9 near-dups (floor 80%, " +
      s"bounded window doc_id < $DocAuditWindow)")

  private val winnowAudit = fingerprintRecallAudit(
    "q_text_fingerprint_winnow_audit", 0.9,
    (s, d) => TextOps.winnowPairs(s, d, Some(DocAuditWindow)),
    "Winnowing recall audit vs exact ngram J>=0.9 near-dups (floor 90%, " +
      s"bounded window doc_id < $DocAuditWindow)")

  // -------------------------------------------- embedding near-dup audit
  // A BOUNDED audit window (vec_id < 500 — constant pair work at any
  // corpus size, the way a production pipeline samples its recall audit),
  // scored with the same decimal dot the oracle uses, so every threshold
  // comparison is bit-identical across Spark, the kernel, and DuckDB.
  // Three facts: (a) n_pairs_045 — the count of window pairs with decimal
  // dot >= 0.45, a kernel-parity check with real mass on both sides (the
  // fixture corpus has NO pairs above cos 0.52, so the 0.9-near-dup
  // ground truth is legitimately empty); (b/c) n_exact / n_lsh at the 0.9
  // near-dup threshold — both 0 here, which still pins PRECISION: a
  // broken band join or verify threshold that hallucinated near-dups
  // would push n_lsh above the oracle's recomputed n_exact. Recall at 0.9
  // is proven in the spec on a planted-near-dup corpus instead.
  private val AuditWindow = 500
  private val embeddingAudit = QueryDef(
    "q_dedup_embedding_audit",
    (s, d) => {
      import s.implicits._
      val emb = Tables.embeddings(s, d)
        .filter($"vec_id" < AuditWindow).select($"vec_id", $"embedding")
      // one-time scale-6 conversion per vector; the window's ~125k pair
      // scores are then pure long multiply-adds (bit-identical to
      // decimal_dot — see functions/ScaledDot.scala)
      val sv = emb.select($"vec_id",
        graft.functions.ScaledDot.decimal_scale6($"embedding").as("sv"))
      val scored = sv.toDF("ida", "va")
        .join(sv.toDF("idb", "vb"), $"ida" < $"idb")
        .select($"ida", $"idb",
          graft.functions.ScaledDot.scaled_dot($"va", $"vb").as("dd"))
      val exact = scored
        .agg(
          sum(($"dd" >= lit("0.45").cast("decimal(38,6)")).cast("long"))
            .as("n_pairs_045"),
          sum(($"dd" >= lit("0.9").cast("decimal(38,6)")).cast("long"))
            .as("n_exact"))
      // LSH side: banded candidates, verified with the SAME decimal dot
      val sigs = emb.select($"vec_id", $"embedding",
        posexplode(graft.functions.SrpSig.srp_sig($"embedding",
          SimilarityOps.DedupBands, SimilarityOps.DedupBits,
          SimilarityOps.SrpSeed)).as(Seq("band", "sig")))
      val lsh = sigs.as("a")
        .join(sigs.as("b"),
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("ida"), col("b.vec_id").as("idb"),
          col("a.embedding").as("va"), col("b.embedding").as("vb"))
        .dropDuplicates("ida", "idb")
        // few candidate pairs: the fused decimal_dot is fine here
        .filter(graft.functions.DecimalDot.decimal_dot($"va", $"vb") >=
          lit("0.9").cast("decimal(38,6)"))
      exact.crossJoin(broadcast(lsh.agg(count("*").as("n_lsh"))))
        .select($"n_pairs_045", $"n_exact", $"n_lsh")
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < $AuditWindow),
      p AS (
        SELECT CAST(round(list_sum(list_transform(range(1, 65),
          i -> CAST(CAST(CAST(a.embedding[i] AS DOUBLE) AS DECIMAL(18,6))
             * CAST(CAST(b.embedding[i] AS DOUBLE) AS DECIMAL(18,6)) AS DECIMAL(20,12)))), 6)
          AS DECIMAL(38,6)) AS dd
        FROM e a JOIN e b ON a.vec_id < b.vec_id)
      SELECT CAST(sum(CASE WHEN dd >= 0.45 THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs_045,
        CAST(sum(CASE WHEN dd >= 0.9 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
        CAST(sum(CASE WHEN dd >= 0.9 THEN 1 ELSE 0 END) AS BIGINT) AS n_lsh
      FROM p"""),
    "Embedding audit on a bounded window: decimal-dot kernel parity at " +
      "0.45 + near-dup precision at 0.9")

  // ------------------------------------------------ SRP / IVF ANN audits
  // Recall of each ANN path against the exact decimal top-K. The exact
  // side is oracle-recomputable (n_queries, n_exact_topk); the ANN hit
  // count is algorithm-specific, so the audit pins a deterministic
  // RECALL FLOOR flag instead (fixed seeds/quantizer => the hit count is
  // a constant of the fixture; the floor has wide margin under it).
  private[graft] def annRecallAudit(name: String, floorHits: Int,
      ann: (SparkSession, String) => DataFrame, doc: String): QueryDef =
    QueryDef(
      name,
      (s, d) => {
        import s.implicits._
        // the NQ×K exact top-K result is consumed twice (the hit join and
        // the count aggregate) — cache the tiny result so the brute-force
        // corpus scoring underneath runs once, not twice
        val exact = SimilarityOps.exactTopK(s, d).select($"qid", $"cid").cache()
        val hits = exact
          .join(ann(s, d).filter($"cid".isNotNull).select($"qid", $"cid"),
            Seq("qid", "cid"), "left_semi")
        exact.agg(
          countDistinct($"qid").as("n_queries"),
          count("*").as("n_exact_topk"))
          .crossJoin(broadcast(hits.agg(
            (count("*") >= floorHits).cast("long").as("recall_floor_ok"))))
      },
      Some(s"""WITH topk AS (
        SELECT q.vec_id AS qid, c.vec_id AS cid,
          row_number() OVER (PARTITION BY q.vec_id ORDER BY
            CAST(round(list_sum(list_transform(range(1, 65),
              i -> CAST(CAST(CAST(q.embedding[i] AS DOUBLE) AS DECIMAL(18,6))
                 * CAST(CAST(c.embedding[i] AS DOUBLE) AS DECIMAL(18,6)) AS DECIMAL(20,12)))), 6)
              AS DECIMAL(38,6)) DESC, c.vec_id) AS rank
        FROM embeddings q JOIN embeddings c
          ON q.vec_id < ${SimilarityOps.NQ} AND q.vec_id <> c.vec_id
        QUALIFY rank <= ${SimilarityOps.K})
      SELECT CAST(count(DISTINCT qid) AS BIGINT) AS n_queries,
        count(*) AS n_exact_topk, CAST(1 AS BIGINT) AS recall_floor_ok
      FROM topk"""),
      doc)

  // Floors sit under the measured fixture hits (SRP 1-2, IVF 19-21 of 50
  // across sf0.001/sf0.01): a single 8-bit SRP band is a NARROW probe by
  // design (its bucket holds ~N/256 of the corpus), so >= 1 true top-K
  // hit is the honest deterministic floor — 0 means the bucket join or
  // signature kernel broke outright. IVF probes 2/16 lists and recovers
  // ~40% of the exact top-K; floor 10 leaves 2x margin.
  private val srpAudit = annRecallAudit("q_simsearch_ann_srp_audit", 1,
    SimilarityOps.srpAnnResults,
    "SRP-ANN recall audit: bucket probe recovers >= 1 of the 50 exact top-K")

  private val ivfAudit = annRecallAudit("q_simsearch_ivf_audit", 10,
    SimilarityOps.ivfResults,
    "IVF-ANN recall audit: nprobe=2 recovers >= 10 of the 50 exact top-K")

  // IVF-PQ scans the same probed lists as IVF but ranks by the QUANTIZED
  // (ADC) distance, so its recall sits under plain IVF's 19-22 (measured
  // 11-12 of 50 across sf0.001/sf0.01 — quantized ranking without a
  // rerank loses roughly half the hits, the published ADC trade); floor
  // 5 leaves >2x margin while still catching an outright broken encode
  // or LUT.
  private val ivfpqAudit = annRecallAudit("q_simsearch_ivfpq_audit", 5,
    SimilarityOps.ivfpqResults,
    "IVF-PQ recall audit: ADC over nprobe=2 recovers >= 5 of the 50 " +
      "exact top-K")

  // ------------------------------------------- heavy-hitters audit
  // The Misra–Gries sketch in its REAL regime: capacity 8 against a
  // 31-token vocabulary, so decrements genuinely fire. The surviving
  // counter SET depends on arrival/merge order (inherent to MG), but the
  // published guarantees do not — the audit pins exactly those:
  //   le_ok:      every estimate ≤ its true count;
  //   floor_ok:   every estimate ≥ true − n/(cap+1)  (checked in exact
  //               integer arithmetic: est·(cap+1) + n ≥ true·(cap+1));
  //   hitters_ok: every token with true count > n/(cap+1) is present.
  // Bounded to the standard doc_id < DocAuditWindow audit window; the
  // deterministic scalars (n_toks, n_terms) are oracle-recomputed.
  private val MGCap = 8
  private val heavyHittersAudit = QueryDef(
    "q_text_heavy_hitters_audit",
    (s, d) => {
      import s.implicits._
      val toks = Tables.documents(s, d)
        .filter($"doc_id" < DocAuditWindow)
        .select(explode(split(lower($"text"), " +")).as("term"))
        .filter($"term" =!= "")
      val stats = toks.agg(count("*").as("n_toks"),
        countDistinct($"term").as("n_terms"))
      val sk = toks.agg(graft.functions.FreqItemsSketch
        .freq_items_sketch($"term", MGCap).as("hh"))
      val est = sk.select(explode($"hh").as("e"))
        .select($"e.item".as("term"), $"e.cnt".as("est"))
      val exact = toks.groupBy($"term").agg(count("*").as("tc"))
      val joined = est.join(exact, Seq("term"), "left")
        .join(broadcast(stats.select($"n_toks")))
        .select($"term", $"est", coalesce($"tc", lit(0L)).as("tc"), $"n_toks")
      val flags = joined.agg(
        (lit(1L) - coalesce(max(($"est" > $"tc").cast("long")), lit(0L)))
          .as("le_ok"),
        (lit(1L) - coalesce(max(
          ($"est" * lit(MGCap + 1) + $"n_toks" < $"tc" * lit(MGCap + 1))
            .cast("long")), lit(0L))).as("floor_ok"))
      val hitFlag = exact.join(broadcast(stats.select($"n_toks")))
        .filter($"tc" * lit(MGCap + 1) > $"n_toks")
        .join(est.select($"term", lit(1L).as("in_sk")), Seq("term"), "left")
        .agg((lit(1L) - coalesce(max($"in_sk".isNull.cast("long")), lit(0L)))
          .as("hitters_ok"))
      stats.join(broadcast(flags)).join(broadcast(hitFlag))
        .select($"n_toks", $"n_terms", $"le_ok", $"floor_ok", $"hitters_ok")
    },
    Some(s"""SELECT CAST(count(*) AS BIGINT) AS n_toks,
        CAST(count(DISTINCT term) AS BIGINT) AS n_terms,
        CAST(1 AS BIGINT) AS le_ok, CAST(1 AS BIGINT) AS floor_ok,
        CAST(1 AS BIGINT) AS hitters_ok
      FROM (SELECT unnest(regexp_split_to_array(lower(text), ' +')) AS term
        FROM documents WHERE doc_id < $DocAuditWindow)
      WHERE term <> ''"""),
    "Misra-Gries guarantee audit: capacity 8 vs 31-token vocabulary, " +
      "order-invariant bound flags")

  override def defs: Seq[QueryDef] =
    Seq(hllAudit, sketchRollupAudit, pctAudit, minhashAudit, simhashAudit,
      winnowAudit, embeddingAudit, srpAudit, ivfAudit, ivfpqAudit,
      heavyHittersAudit)
}
