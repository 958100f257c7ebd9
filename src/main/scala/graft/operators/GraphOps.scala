package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, QueryPack}

/** Dedup-group resolution: connected components over the near-dup pair
  * graph. Pairwise near-dup detection (n-gram Jaccard / MinHash / SimHash)
  * emits EDGES; an actual dedup pass needs the transitive GROUPS — "keep
  * one doc per component" — which at web scale is a graph problem over
  * billions of edges, not a driver-side union-find.
  *
  * Algorithm: alternating large-star / small-star contraction (Kiveris et
  * al., "Connected Components in MapReduce and Beyond", SoCC 2014) — the
  * standard shuffle-based CC algorithm. Each phase is one keyed
  * aggregation plus one keyed join (both hash-partitioned on node id, no
  * broadcast of anything graph-sized), converges in O(log²) rounds w.h.p.,
  * and every intermediate is an edge set bounded by the input edge count.
  * Per round the lineage is cut with an eager `localCheckpoint` — on a
  * cluster this is the checkpoint-to-local-dirs pattern every iterative
  * Spark algorithm needs so plan depth (and recovery cost) stays O(1) in
  * the round count rather than O(rounds).
  *
  * The reference has no graph operator (its corpus fits one process, where
  * union-find is a dict — conceptually `utils/transform.py`'s in-memory
  * pass); this is the scale-out re-expression.
  */
object GraphOps extends QueryPack {

  /** Convergence backstop. Large/small-star converges in O(log² n) rounds
    * w.h.p.; 25 alternations cover graphs far beyond any fixture (and on
    * pathological inputs `require` fails loudly instead of looping). */
  private val MaxRounds = 25

  /** Alternating star contraction. `edges0`: two LongType columns, any
    * orientation, self-loops tolerated. Returns (node, component) where
    * component = min node id reachable — one row per node that appears in
    * at least one edge (singletons have no edge and no dedup decision to
    * make, so they are deliberately absent). */
  private[graft] def connectedComponents(
      s: SparkSession, edges0: DataFrame): DataFrame = {
    import s.implicits._

    // canonical undirected edge set (u < v), deduplicated
    def canon(e: DataFrame): DataFrame = e
      .filter($"a" =!= $"b")
      .select(least($"a", $"b").as("u"), greatest($"a", $"b").as("v"))
      .distinct()
    // both directions — per-node neighborhoods come from grouping this
    def sym(e: DataFrame): DataFrame =
      e.select($"u", $"v").union(e.select($"v".as("u"), $"u".as("v")))
    // m(u) = min(Γ(u) ∪ {u}) — one keyed aggregation, no collect
    def mins(se: DataFrame): DataFrame = se
      .groupBy($"u").agg(min($"v").as("mn"))
      .select($"u", least($"u", $"mn").as("m"))
    // cheap fixpoint signature: (|E|, XOR of xxhash64(u,v)) — order-
    // invariant and overflow-free (edges are distinct, so the XOR is a
    // clean set fingerprint; a long SUM would overflow under ANSI)
    def sig(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    var edges = canon(edges0.toDF("a", "b")).localCheckpoint()
    var prevEdges = edges
    var prev = sig(edges)
    var converged = prev._1 == 0L // empty graph: nothing to contract
    var rounds = 0
    while (!converged && rounds < MaxRounds) {
      // large-star: ∀ v ∈ Γ(u), v > u: connect v to m(u). Every edge is
      // processed from its SMALLER endpoint's row; big-neighborhood work
      // is a keyed join, so a hot node's edges spread across tasks.
      val se1 = sym(edges)
      val afterLarge = canon(
        se1.filter($"v" > $"u").join(mins(se1), "u")
          .select($"v".as("a"), $"m".as("b"))).localCheckpoint()
      // small-star (paper-exact: min over the SMALLER neighbors only):
      // ∀ v ∈ Γ⁻(u): connect v to m⁻(u) = min(Γ⁻(u) ∪ {u}), plus
      // (u, m⁻(u)) so u stays attached. Every edge processed from its
      // LARGER endpoint's row; nodes with no smaller neighbor emit
      // nothing here (their edges were handled large-star side).
      val smaller = sym(afterLarge).filter($"v" < $"u")
      val m2 = smaller.groupBy($"u").agg(min($"v").as("m"))
      val afterSmall = canon(
        smaller.join(m2, "u")
          .select($"v".as("a"), $"m".as("b"))
          .union(m2.select($"u".as("a"), $"m".as("b")))).localCheckpoint()
      edges = afterSmall
      val cur = sig(edges)
      // signature match is the cheap gate; the fixpoint DECLARATION is
      // exact — equal cardinality (from the signature) plus an empty
      // one-sided set difference proves set equality, so a 64-bit hash
      // collision can never terminate contraction on a non-star edge
      // set. Runs at most once per converged round; both sides are
      // already localCheckpointed, so the except job is cheap.
      converged = cur == prev &&
        edges.except(prevEdges).limit(1).count() == 0L
      prev = cur
      prevEdges = edges
      rounds += 1
    }
    require(converged,
      s"connected components did not reach a fixpoint in $MaxRounds rounds")
    // fixpoint = disjoint stars rooted at each component's min id: a
    // node's label is min over its incident edges (the root labels
    // itself — its neighbors are all larger children)
    mins(sym(edges)).select($"u".as("node"), $"m".as("component"))
  }

  /** Components of the exact J >= 0.5 3-gram near-dup graph (the declared
    * q_dedup_ngram_jaccard pair set, prefix-filtered strategy). Output one
    * row per near-dup doc: its component (= min doc id of its group),
    * the group size, and the keep decision (canonical = component root). */
  private val dedupComponents = QueryDef(
    "q_dedup_components",
    (s, d) => {
      import s.implicits._
      // the SHARED materialized pair set (DedupOps.sharedNgramPairs) —
      // pair generation is the engine's most expensive stage and must
      // not be recomputed per consumer (VERDICT r8 task 3)
      val pairs = DedupOps.sharedNgramPairs(s, d).select($"doc1", $"doc2")
      val comp = connectedComponents(s, pairs)
      val w = org.apache.spark.sql.expressions.Window.partitionBy($"component")
      comp
        .select($"node".as("doc_id"), $"component",
          count(lit(1)).over(w).as("n_members"))
        .withColumn("is_canonical",
          ($"doc_id" === $"component").cast("long"))
        .orderBy($"doc_id")
    },
    Some(s"""WITH RECURSIVE ${DedupOps.NgramPairCtes},
      pairs AS (SELECT doc1 AS u, doc2 AS v FROM jpairs WHERE j >= 0.5),
      edges AS (SELECT u, v FROM pairs UNION SELECT v AS u, u AS v FROM pairs),
      reach AS (
        SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges) t
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      comp AS (SELECT u AS doc_id, min(v) AS component FROM reach GROUP BY u)
      SELECT CAST(doc_id AS BIGINT) AS doc_id,
        CAST(component AS BIGINT) AS component,
        CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS n_members,
        CAST(CASE WHEN doc_id = component THEN 1 ELSE 0 END AS BIGINT)
          AS is_canonical
      FROM comp ORDER BY doc_id"""),
    "Near-dup group resolution: large-star/small-star connected components " +
      "over the exact J>=0.5 pair graph")

  // ------------------------------------------------- q_graph_pagerank
  /** Fixed iteration count — PageRank here is a quality-weighting pass
    * (rank docs by how central they are in the near-dup/similarity
    * graph, the web-graph analog of per-page quality weights a corpus
    * pipeline attaches before sampling), not a convergence study; a
    * fixed unrolled depth is also what makes the DuckDB oracle exact. */
  private[graft] val PrIters = 8

  /** Integer-millionths PageRank with damping 0.85 over an UNDIRECTED
    * edge set (every node has deg >= 1, so no dangling-mass term).
    * All arithmetic is the engine's mil idiom — BIGINT millionths with
    * HALF_UP rational rounding at every division — so an 8-iteration
    * unrolled DuckDB replay is bit-identical. Per iteration: one keyed
    * join (edge source → rank), one keyed aggregation (edge target);
    * lineage cut per round with localCheckpoint, the house iterative
    * pattern (see [[connectedComponents]]).
    *
    * Precondition: `edgesIn` is a DISTINCT canonical pair set
    * (a < b, no self-loops) — what [[DedupOps.sharedNgramPairs]]
    * produces; symmetrization here assumes it. */
  private[graft] def pagerankMil(
      s: SparkSession, edgesIn: DataFrame, iters: Int): DataFrame = {
    import s.implicits._
    def mil0(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      round(num.cast("decimal(28,2)") / den, 0).cast("bigint")
    val e0 = edgesIn.toDF("a", "b")
    val edges = e0.select($"a".as("u"), $"b".as("v"))
      .union(e0.select($"b".as("u"), $"a".as("v")))
      .localCheckpoint()
    val deg = edges.groupBy($"u").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val n = deg.count() // node count: the same driver-scalar class as
                        // k-means K — bounded, one job
    if (n == 0)
      return deg.select($"u".as("doc_id"), $"deg",
        lit(0L).as("pagerank_mil"))
    def ratMil(num: Long): Long =
      new java.math.BigDecimal(num).setScale(2)
        .divide(new java.math.BigDecimal(n), 0,
          java.math.RoundingMode.HALF_UP).longValueExact()
    val initMil = ratMil(1000000L) // uniform start: round(1e6 / N)
    val baseMil = ratMil(150000L)  // teleport term: round(0.15e6 / N)
    // (u, v, deg(u)) — static across iterations, materialized once
    val ew = edges.join(deg, "u").localCheckpoint()
    // The iteration chain itself is LAZY (r16, guide §1.2: cut the pass
    // count first): iters is a FIXED unrolled depth and pr(k) has exactly
    // one consumer, pr(k+1) — so the whole loop is one linear plan over
    // the checkpointed (u, v, deg) relation and the caller's single
    // action runs all iterations as stages of ONE job. The previous
    // per-iteration localCheckpoint paid `iters` sequential driver
    // round-trips for lineage depth that is already O(1) in the input
    // (the only multi-consumed relation, ew, stays checkpointed).
    var pr = deg.select($"u".as("node"), lit(initMil).as("pr"))
    for (_ <- 1 to iters) {
      pr = ew.join(pr, ew("u") === pr("node"))
        .select($"v", mil0($"pr", $"deg").as("c"))
        .groupBy($"v").agg(sum($"c").as("s"))
        .select($"v".as("node"),
          (lit(baseMil) + mil0(lit(85L) * $"s", lit(100L))).as("pr"))
    }
    pr.join(deg, pr("node") === deg("u"))
      .select($"node".as("doc_id"), $"deg", $"pr".as("pagerank_mil"))
      .orderBy($"doc_id")
  }

  /** The unrolled-iteration oracle body: pr0..pr$iters as MATERIALIZED
    * CTEs (plain CTEs inline and re-expand the chain exponentially —
    * the q_text_bpe lesson). */
  private def prIterCtes(iters: Int): String =
    (1 to iters).map { k =>
      s"""pr$k AS MATERIALIZED (
        SELECT e.v AS node, (SELECT base FROM nn) +
          CAST(round(CAST(85 * sum(CAST(round(
              CAST(p.pr AS DECIMAL(28,2)) / d.deg, 0) AS BIGINT))
            AS DECIMAL(28,2)) / 100, 0) AS BIGINT) AS pr
        FROM edges e JOIN pr${k - 1} p ON e.u = p.node
        JOIN deg d ON e.u = d.u
        GROUP BY e.v)"""
    }.mkString(",\n      ")

  private val graphPagerank = QueryDef(
    "q_graph_pagerank",
    (s, d) => {
      import s.implicits._
      pagerankMil(s,
        DedupOps.sharedNgramPairs(s, d).select($"doc1", $"doc2"), PrIters)
    },
    Some(s"""WITH ${DedupOps.NgramPairCtes},
      prs AS (SELECT doc1 AS u, doc2 AS v FROM jpairs WHERE j >= 0.5),
      edges AS MATERIALIZED (
        SELECT u, v FROM prs UNION ALL SELECT v AS u, u AS v FROM prs),
      deg AS MATERIALIZED (
        SELECT u, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY u),
      nn AS MATERIALIZED (SELECT
          CAST(round(CAST(1000000 AS DECIMAL(28,2)) / count(*), 0)
            AS BIGINT) AS init,
          CAST(round(CAST(150000 AS DECIMAL(28,2)) / count(*), 0)
            AS BIGINT) AS base
        FROM deg),
      pr0 AS MATERIALIZED (
        SELECT u AS node, (SELECT init FROM nn) AS pr FROM deg),
      ${prIterCtes(PrIters)}
      SELECT CAST(p.node AS BIGINT) AS doc_id, d.deg AS deg,
        p.pr AS pagerank_mil
      FROM pr$PrIters p JOIN deg d ON p.node = d.u
      ORDER BY doc_id"""),
    s"$PrIters-iteration integer-millionths PageRank (damping 0.85) over " +
      "the J>=0.5 near-dup graph — per-doc centrality/quality weights; " +
      "one keyed join + one keyed aggregation per iteration")

  override def defs: Seq[QueryDef] = Seq(dedupComponents, graphPagerank)
}
