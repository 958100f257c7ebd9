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

  override def defs: Seq[QueryDef] = Seq(dedupComponents)
}
