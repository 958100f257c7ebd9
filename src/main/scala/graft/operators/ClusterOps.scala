package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, QueryPack, Tables}

/** Corpus-scale embedding clustering: distributed Lloyd's k-means, and the
  * SemDeDup-style semantic dedup that consumes it (Abbas et al. 2023:
  * cluster the embedding space, then drop near-identical members within
  * each cluster — the clustering bounds the pairwise work that a naive
  * all-pairs cosine pass cannot).
  *
  * Contrast with [[SimilarityOps]]' IVF coarse quantizer: that k-means
  * fits on a BOUNDED driver-side sample (4096 vectors) because a
  * quantizer only needs approximate centroids. This operator is the
  * corpus-scale training loop itself — every iteration assigns EVERY
  * vector distributedly (broadcast centroids, map-side argmin) and
  * recomputes centroids with a keyed aggregation; the only driver
  * materialization is K×dim centroid sums per iteration (kilobytes at
  * any corpus size). That per-iteration collect-broadcast cycle is
  * exactly how Spark MLlib's KMeans runs at scale.
  *
  * Determinism contract (what makes a float-heavy iterative algorithm
  * DuckDB-oracle-able): all arithmetic happens in the scale-6 unscaled
  * integer domain — vectors enter through the same
  * `BigDecimal.valueOf(x).setScale(6, HALF_UP)` conversion as the
  * similarity tier ([[graft.functions.DecimalScale6]]), distances are
  * exact integer Σ(aᵢ−bᵢ)² (scale 12 unscaled, fits a long: ≤ 64·(4e6)²
  * ≈ 1e15), argmin ties break on cluster id, and centroid means round
  * HALF_UP in pure integer arithmetic. No step depends on float
  * summation order, so any partitioning of the corpus produces
  * bit-identical centroids.
  *
  * The reference has no clustering operator; this is part of the
  * LLM-training-data tier (SURVEY §2.3).
  */
object ClusterOps extends QueryPack {

  /** K scales with the corpus (VERDICT r8 task 6): SemDeDup's Σ|c|² ≈
    * N²/K pair bound and the per-cluster join-key cardinality only hold
    * at 100× if K grows with N — the published pipelines use ~100k
    * clusters at LAION scale. ⌈√N⌉ keeps BOTH the expected per-cluster
    * size (N/K ≈ √N) and the cluster count sublinear; the floor keeps
    * the fixture behavior stable and the cap bounds the K×Dim driver
    * state (4096 · 64 longs ≈ 2 MB). */
  private[graft] def effectiveK(n: Long): Int =
    math.max(8, math.min(4096, math.ceil(math.sqrt(n.toDouble)).toInt))

  /** The K each declared query actually used this run, keyed by
    * (query, corpus dir), recorded so the lazily-rendered oracle
    * (QueryDef.oracleFn) replays the SAME training loop — the
    * corpus-count → K computation cannot happen in static SQL.
    * [[recordedK]] FAILS LOUDLY when rendering precedes running (ADVICE
    * r9 — the silent K=8 default could produce a plausible-but-wrong
    * oracle), and also when a multi-corpus JVM recorded DIFFERENT Ks
    * for different corpora (ADVICE r10 — the nullary oracleFn cannot
    * name its corpus, so last-write-wins would silently embed the wrong
    * corpus's K; ambiguity must abort, not guess). Verify's contract
    * (one corpus; queries run, THEN oracles render) satisfies both by
    * construction. */
  private val lastK =
    scala.collection.concurrent.TrieMap.empty[(String, String), Int]
  private[graft] def recordK(query: String, dir: String, k: Int): Unit = {
    // Drop the query's entries for OTHER corpora: without this the
    // ambiguity abort below was permanent once two corpora had recorded
    // different Ks — the error's own advice ("rerun the query fn for the
    // corpus this oracle targets") could never unblock a render (ADVICE
    // r11). With the clear, a rerun re-scopes the recorded K to the
    // corpus that ran last, which is exactly the corpus a
    // subsequently-rendered oracle targets (Verify's run-then-render
    // contract). The abort branch still guards the remaining window: a
    // CONCURRENT multi-corpus interleaving between recordK and render.
    // A SEQUENTIAL contract violation (run A, run B, render A's oracle
    // without rerunning A) is no longer aborted here — but it is not
    // silently green either: the rendered SQL embeds B's K, which the
    // driver's hash-compare against A's data then fails LOUDLY as a
    // per-query mismatch. The abort was a nicer message for that case;
    // the safety net (the hash gate) is unchanged.
    // Clear+put under one lock: two concurrent recordK calls for
    // different corpora could otherwise interleave so both entries
    // survive (re-creating the ambiguity) or the newest write is
    // cleared (ADVICE r12). recordK is not hot-path; a monitor is fine.
    lastK.synchronized {
      lastK.keys.filter(e => e._1 == query && e._2 != dir)
        .foreach(lastK.remove)
      lastK((query, dir)) = k
    }
  }
  private[graft] def recordedK(query: String): Int = {
    val ks = lastK.collect { case ((q, dir), k) if q == query => dir -> k }
    if (ks.isEmpty) throw new IllegalStateException(
      s"oracle for $query rendered before the query ran: no recorded K " +
        "(run the query fn first; Verify does)")
    if (ks.values.toSet.size > 1) throw new IllegalStateException(
      s"oracle for $query is ambiguous: different K per corpus " +
        ks.map { case (d, k) => s"$d->K=$k" }.mkString("(", ", ", ")") +
        " — rerun the query fn for the corpus this oracle targets")
    ks.values.head
  }

  private[graft] val Dim = 64
  private[graft] val Iters = 3
  /** SemDeDup similarity threshold. The published algorithm tunes ε per
    * corpus; the synthetic fixture has no true semantic duplicates (max
    * pairwise cosine ≈ 0.51), so the threshold marks the extreme tail of
    * the similarity distribution rather than a universal constant. */
  private val SemTau = "0.35"

  /** Exact integer squared L2 distance between two scale-6 unscaled long
    * vectors (scale-12 unscaled result) — the codegen'd
    * [[graft.functions.LongDist2]] kernel: the assignment stage scores
    * |corpus| × K pairs per iteration, and the declarative
    * aggregate∘zip_with formulation walked two interpreted boxed
    * lambdas per element. */
  private def dist2(a: Column, c: Column): Column =
    graft.functions.LongDist2.long_dist2(a, c)

  /** HALF_UP (ties away from zero) integer mean — the scale-6 unscaled
    * form of `round(sum/cnt, 6)`. Pure integer so both engines agree. */
  private def halfUpDiv(sum: Long, cnt: Long): Long = {
    val a = math.abs(sum)
    val q = (2L * a + cnt) / (2L * cnt)
    if (sum >= 0) q else -q
  }

  /** The scale-6 corpus view: (vec_id, sa array<long>). Cached — the
    * training loop scans it Iters+1 times. Rows with a NULL element are
    * excluded (mirrored in the oracle's e_rows filter): decimal_scale6
    * encodes a null element as the ScaledDot.NullSentinel long, whose
    * square overflows the integer distance under ANSI — the clustering
    * kernel works on whole vectors only, unlike the dot kernel's
    * documented per-element skip rule. */
  private def scaledCorpus(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, d)
      .filter($"embedding".isNotNull && size($"embedding") === Dim &&
        !exists($"embedding", _.isNull))
      .select($"vec_id",
        graft.functions.ScaledDot.decimal_scale6($"embedding").as("sa"))
      .cache()
  }

  /** One distributed assignment pass under the given centroids: returns
    * (vec_id, cluster, d2). The K-row centroid relation is broadcast
    * (deliberate tiny-side BNLJ, same class as the query-vector attach
    * in q_simsearch_cosine); the argmin is a map-side-combined keyed
    * aggregation with a lexicographic (d2, cluster) tie-break. */
  private def assign(s: SparkSession, sv: DataFrame,
      cents: Seq[(Long, Array[Long])]): DataFrame = {
    import s.implicits._
    val centDf = cents.map { case (c, a) => (c, a.toSeq) }
      .toDF("cluster", "carr")
    sv.crossJoin(broadcast(centDf))
      .select($"vec_id", $"cluster", dist2($"sa", $"carr").as("d2"))
      .groupBy($"vec_id")
      .agg(min(struct($"d2", $"cluster")).as("b"))
      .select($"vec_id", $"b.cluster".as("cluster"), $"b.d2".as("d2"))
  }

  // A carried-vector argmin variant (`first(sa)` riding the min-struct
  // aggregate so the join back to `sv` disappears) was tried mid-r16 and
  // REVERTED on 10× stress evidence: an ArrayType aggregation buffer is
  // not HashAggregate-mutable and `first` is declarative (so no
  // ObjectHashAggregate either) — the argmin degrades to a SORT-based
  // aggregate whose input is corpus×K rows each carrying the FULL
  // Dim-long vector, and at 10× that sort cost +47% (q_cluster_kmeans
  // 6.3→9.3 s) / +85% (q_cluster_semdedup 5.2→9.6 s) against a
  // faster-host tailwind. The narrow argmin + join form below sorts
  // 24-byte rows and re-attaches vectors through one keyed join of the
  // cached corpus — the scale-correct shape (guide §2.3: shuffle/sort
  // the lightweight proxy, move heavy payloads once). The SUBSPACE
  // variant (fitCentroidsSubs) keeps the carried form: its slices are
  // Dim/M longs and the same stress run measured it faster.

  /** Lloyd's iterations; returns the final centroids. Each iteration is
    * one action (narrow argmin + vector re-attach join + sums in a
    * single plan) and one K×Dim-row driver collect. */
  private[graft] def fitCentroids(s: SparkSession, sv: DataFrame, k: Int)
      : Seq[(Long, Array[Long])] = {
    import s.implicits._
    // deterministic init: the first K vectors by id are the seed
    // centroids (both engines express this as `vec_id < K`)
    var cents: Seq[(Long, Array[Long])] = sv.filter($"vec_id" < k)
      .limit(k) // K rows by construction; syntactic bound for the collect
      .select($"vec_id", $"sa").as[(Long, Seq[Long])]
      .collect().sortBy(_._1).map { case (c, a) => (c, a.toArray) }.toSeq
    for (_ <- 0 until Iters) {
      // K×Dim centroid sums — kilobytes at any corpus size
      val sums = assign(s, sv, cents).join(sv, "vec_id")
        .select($"cluster", posexplode($"sa"))
        .toDF("cluster", "pos", "x")
        .groupBy($"cluster", $"pos")
        .agg(sum($"x").as("sx"), count(lit(1)).as("c"))
        .as[(Long, Int, Long, Long)]
        .collect()
      val byCluster = sums.groupBy(_._1)
      cents = cents.map { case (c, old) =>
        byCluster.get(c) match {
          case Some(rows) =>
            val arr = old.clone()
            rows.foreach { case (_, pos, sx, cnt) =>
              arr(pos) = halfUpDiv(sx, cnt) }
            (c, arr)
          case None => (c, old) // empty cluster keeps its centroid
        }
      }
    }
    cents
  }

  /** Shared DuckDB replica of the training loop: CTEs up to
    * `assign$Iters` (the final assignment) and `cent$Iters` (the final
    * centroids), all in exact integer arithmetic. `k` is the run's
    * effective cluster count (recorded by the query fn). */
  private def kmeansCtes(k: Int): String = {
    val parts = Seq.newBuilder[String]
    parts += s"""e_rows AS (
        SELECT vec_id, t.dim AS dim,
          CAST(CAST(CAST(embedding[t.dim] AS DOUBLE) AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS el
        FROM embeddings, range(1, ${Dim + 1}) t(dim)
        WHERE len(embedding) = $Dim
          AND len(list_filter(embedding, x -> x IS NULL)) = 0),
      cent0 AS (SELECT vec_id AS cluster, dim, el AS cl FROM e_rows WHERE vec_id < $k)"""
    for (k <- 0 to Iters) {
      parts += s"""dist$k AS (
        SELECT e.vec_id, c.cluster, SUM((e.el - c.cl) * (e.el - c.cl)) AS d2
        FROM e_rows e JOIN cent$k c USING (dim) GROUP BY 1, 2),
      assign$k AS (
        SELECT vec_id, cluster, d2 FROM (
          SELECT vec_id, cluster, d2,
            row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
          FROM dist$k) WHERE rn = 1)"""
      if (k < Iters)
        parts += s"""cent${k + 1} AS (
        SELECT a.cluster, e.dim,
          CAST(CASE WHEN SUM(e.el) >= 0
            THEN (2 * SUM(e.el) + COUNT(*)) // (2 * COUNT(*))
            ELSE -((2 * -SUM(e.el) + COUNT(*)) // (2 * COUNT(*))) END AS BIGINT) AS cl
        FROM assign$k a JOIN e_rows e USING (vec_id)
        GROUP BY 1, 2
        UNION ALL
        SELECT cluster, dim, cl FROM cent$k
        WHERE cluster NOT IN (SELECT DISTINCT cluster FROM assign$k))"""
    }
    parts.result().mkString(",\n")
  }

  // ------------------------------------------------------ k-means
  private val clusterKmeans = QueryDef(
    "q_cluster_kmeans",
    (s, d) => {
      import s.implicits._
      val sv = scaledCorpus(s, d)
      val k = effectiveK(sv.count())
      recordK("q_cluster_kmeans", d, k)
      val cents = fitCentroids(s, sv, k)
      // eager K-row materialization of the final assignment stats, so the
      // corpus cache can be RELEASED here instead of accumulating one
      // cached copy per cluster query across a bench run (ADVICE r8)
      val stats = assign(s, sv, cents)
        .groupBy($"cluster")
        .agg(count(lit(1)).as("n_vecs"), sum($"d2").as("sse12"))
        .localCheckpoint()
      sv.unpersist(false)
      val cnorm = cents.map { case (c, a) => (c, a.map(math.abs).sum) }
        .toDF("cluster", "cnorm1_6")
      cnorm.join(broadcast(stats), Seq("cluster"), "left")
        .select($"cluster",
          coalesce($"n_vecs", lit(0L)).as("n_vecs"),
          coalesce($"sse12", lit(0L)).as("sse12"),
          $"cnorm1_6")
        .orderBy($"cluster")
    },
    None,
    s"Distributed Lloyd's k-means (K=ceil(sqrt(N)), $Iters iterations) " +
      "over the embedding corpus, integer-exact and partitioning-invariant",
    oracleFn = Some(() => s"""WITH ${kmeansCtes(recordedK("q_cluster_kmeans"))}
      SELECT c.cluster, CAST(COALESCE(s.n_vecs, 0) AS BIGINT) AS n_vecs,
        CAST(COALESCE(s.sse12, 0) AS BIGINT) AS sse12, c.cnorm1_6
      FROM (SELECT cluster, CAST(SUM(ABS(cl)) AS BIGINT) AS cnorm1_6
            FROM cent$Iters GROUP BY 1) c
      LEFT JOIN (SELECT cluster, CAST(count(*) AS BIGINT) AS n_vecs,
                 CAST(SUM(d2) AS BIGINT) AS sse12
                 FROM assign$Iters GROUP BY 1) s USING (cluster)
      ORDER BY c.cluster"""))

  // ------------------------------------------------------ SemDeDup
  // Within-cluster pairwise similarity only: the k-means partition bounds
  // the quadratic term at Σ|cluster|² ≈ N²/K. The fixture's K=8 is sized
  // to its 500–2000 vectors; production SemDeDup scales K with the corpus
  // (the paper uses ~100k clusters for LAION-scale data), keeping both
  // the per-cluster pair count and the join-key cardinality healthy.
  // Drop rule: a vector is dropped iff some LOWER-id member of its
  // cluster scores decimal-dot >= SemTau against it — deterministic and
  // engine-portable (the iterative keep-the-centroid-closest variant
  // would need float-order-dependent chains).
  private val clusterSemdedup = QueryDef(
    "q_cluster_semdedup",
    (s, d) => {
      import s.implicits._
      val sv = scaledCorpus(s, d)
      val k = effectiveK(sv.count())
      recordK("q_cluster_semdedup", d, k)
      val cents = fitCentroids(s, sv, k)
      // eagerly materialized ONCE: `asg` feeds both sides of the pair
      // self-join below plus the final keep projection — without the
      // checkpoint the |corpus|×K crossJoin+argmin subtree executed
      // three times (ADVICE r8). Eager also lets the corpus cache be
      // released here rather than accumulating across a bench run.
      val asg = assign(s, sv, cents).join(sv, "vec_id")
        .select($"vec_id", $"cluster", $"sa")
        .localCheckpoint()
      sv.unpersist(false)
      val dropped = asg.as("a").join(asg.as("b"),
          $"a.cluster" === $"b.cluster" && $"a.vec_id" < $"b.vec_id")
        .filter(graft.functions.ScaledDot.scaled_dot($"a.sa", $"b.sa") >=
          lit(SemTau).cast("decimal(38,6)"))
        .select($"b.vec_id".as("vec_id")).distinct()
      asg.join(dropped.withColumn("hit", lit(1L)), Seq("vec_id"), "left")
        .select($"vec_id", $"cluster",
          ($"hit".isNull).cast("long").as("keep"))
        .orderBy($"vec_id")
    },
    None,
    "SemDeDup semantic dedup: within-k-means-cluster pairwise decimal " +
      s"dot >= $SemTau drops the higher id (K=ceil(sqrt(N)))",
    oracleFn = Some(() => s"""WITH ${kmeansCtes(recordedK("q_cluster_semdedup"))},
      wsa AS (SELECT a.vec_id, a.cluster, e.embedding
              FROM assign$Iters a JOIN embeddings e USING (vec_id)),
      sem_dropped AS (
        SELECT DISTINCT b.vec_id AS v
        FROM wsa a JOIN wsa b
          ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        WHERE CAST(round(list_sum(list_transform(range(1, ${Dim + 1}),
          i -> CAST(CAST(CAST(a.embedding[i] AS DOUBLE) AS DECIMAL(18,6))
             * CAST(CAST(b.embedding[i] AS DOUBLE) AS DECIMAL(18,6)) AS DECIMAL(20,12)))), 6)
          AS DECIMAL(38,6)) >= $SemTau)
      SELECT a.vec_id, a.cluster,
        CAST(CASE WHEN p.v IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
      FROM assign$Iters a LEFT JOIN sem_dropped p ON a.vec_id = p.v
      ORDER BY a.vec_id"""))

  // --------------------------------------------- product quantization
  // PQ (Jégou et al., "Product Quantization for Nearest Neighbor
  // Search", TPAMI 2011): split the embedding into M subspaces, learn a
  // K-centroid codebook per subspace (the same integer-exact Lloyd's
  // loop as q_cluster_kmeans, run on the subvector slices), and encode
  // every vector as M small codes — 64 dims × 4 bytes collapse to M=4
  // nibble-scale codes, the memory step that makes billion-vector ANN
  // indexes (IVF-PQ) fit RAM. K is a FIXED hyperparameter (16 here;
  // production uses 256/subspace), so unlike q_cluster_kmeans the
  // DuckDB oracle is static — it replays all M training loops and the
  // encode pass in exact integer arithmetic, making the codebook AND
  // the codes hash-checked.
  //
  // Scale shape: training collects only K×dsub centroid sums per
  // (subspace, iteration) — kilobytes; encoding is one crossJoin against
  // the broadcast M×K-row codebook (the kmeans assignment class), one
  // (vec_id, sub) argmin aggregation, one vec_id reassembly shuffle.
  private[graft] val PqM = 4
  private[graft] val PqK = 16
  private[graft] val PqDsub = Dim / PqM

  /** Lloyd's iterations over M INDEPENDENT subspaces in ONE pass per
    * iteration (r16 optimization — the q_embed_pq training loop).
    * `svSubs` is the (sub, vec_id, sa) union of every subspace slice;
    * each iteration runs ONE action computing the (sub, cluster, pos)
    * centroid sums for all subspaces at once, where the per-subspace
    * form paid (Iters + 1) sequential driver actions per subspace —
    * 4× the job count for the same total compute (guide §1.2: fix the
    * number of passes first). Per-subspace arithmetic is identical to
    * [[fitCentroids]]: the assignment joins the broadcast codebook on
    * `sub` (so a vector only scores against its own subspace's
    * centroids), the argmin groups on (sub, vec_id) with the same
    * (d2, cluster) tie-break, and the mean is the same exact-integer
    * HALF_UP — subspaces never interact, so the learned codebooks are
    * bit-identical to the per-subspace loop's (EmbedIndexSpec /
    * IterativeOpsSpec pin q_embed_pq against reference Lloyd's). */
  private[graft] def fitCentroidsSubs(s: SparkSession, svSubs: DataFrame,
      k: Int): Seq[(Int, Long, Array[Long])] = {
    import s.implicits._
    // deterministic init per subspace: the first K vectors by id
    var cents: Map[(Int, Long), Array[Long]] = svSubs
      .filter($"vec_id" < k)
      .select($"sub", $"vec_id", $"sa").as[(Int, Long, Seq[Long])]
      .collect().map { case (m, c, a) => (m, c) -> a.toArray }.toMap
    for (_ <- 0 until Iters) {
      val centDf = cents.toSeq.map { case ((m, c), a) => (m, c, a.toSeq) }
        .toDF("sub", "cluster", "carr")
      // M × K×Dsub centroid sums — kilobytes at any corpus size.
      // r16: the slice rides the argmin (first(sa) — every row of a
      // (sub, vec_id) group carries the same sa), so the join back to
      // svSubs disappears. Kept for the SUBSPACE loop only: slices are
      // Dim/M longs, so the sort-aggregate rows stay narrow — the 10×
      // stress that refuted the full-width variant (see fitCentroids)
      // measured this one faster.
      val sums = svSubs.join(broadcast(centDf), Seq("sub"))
        .groupBy($"sub", $"vec_id")
        .agg(min(struct(dist2($"sa", $"carr").as("d2"), $"cluster")).as("b"),
          first($"sa").as("sa"))
        .select($"sub", $"b.cluster".as("cluster"), posexplode($"sa"))
        .toDF("sub", "cluster", "pos", "x")
        .groupBy($"sub", $"cluster", $"pos")
        .agg(sum($"x").as("sx"), count(lit(1)).as("c"))
        .as[(Int, Long, Int, Long, Long)]
        .collect()
      val byKey = sums.groupBy(r => (r._1, r._2))
      cents = cents.map { case (key, old) =>
        byKey.get(key) match {
          case Some(rows) =>
            val arr = old.clone()
            rows.foreach { case (_, _, pos, sx, cnt) =>
              arr(pos) = halfUpDiv(sx, cnt) }
            key -> arr
          case None => key -> old // empty cluster keeps its centroid
        }
      }
    }
    cents.toSeq.map { case ((m, c), a) => (m, c, a) }
      .sortBy(t => (t._1, t._2))
  }

  /** The M learned sub-codebooks: (sub, cluster, centroid slice) —
    * trained jointly in one pass per iteration ([[fitCentroidsSubs]]). */
  private[graft] def pqCodebook(s: SparkSession, sv: DataFrame)
      : Seq[(Int, Long, Array[Long])] = {
    import s.implicits._
    val svSubs = sv.select($"vec_id", posexplode(
        array((0 until PqM).map(m =>
          slice($"sa", m * PqDsub + 1, PqDsub)): _*)))
      .toDF("vec_id", "sub", "sa")
      .select($"sub", $"vec_id", $"sa")
    fitCentroidsSubs(s, svSubs, PqK)
  }

  private val embedPq = QueryDef(
    "q_embed_pq",
    (s, d) => {
      import s.implicits._
      val sv = scaledCorpus(s, d)
      val book = pqCodebook(s, sv)
      val centDf = book.map { case (m, c, a) => (m.toLong, c, a.toSeq) }
        .toDF("sub", "cluster", "carr")
      // eagerly materialized BEFORE the corpus cache releases — the
      // sibling kmeans/semdedup pattern: unpersisting first would make
      // the lazily-returned encode recompute decimal_scale6 from
      // parquet uncached when the caller finally executes it
      val out = sv.crossJoin(broadcast(centDf))
        .select($"vec_id", $"sub", $"cluster",
          dist2(slice($"sa", ($"sub" * PqDsub + 1).cast("int"),
            lit(PqDsub)), $"carr").as("d2"))
        .groupBy($"vec_id", $"sub")
        .agg(min(struct($"d2", $"cluster")).as("b"))
        .groupBy($"vec_id")
        .agg(
          array_join(transform(
            array_sort(collect_list(struct($"sub", $"b.cluster".as("code")))),
            x => x.getField("code").cast("string")), ",").as("codes"),
          sum($"b.d2").as("err12"))
        .localCheckpoint()
      sv.unpersist(false)
      out.orderBy($"vec_id")
    },
    Some {
      val subCtes = (0 until PqM).map { m =>
        val lo = m * PqDsub + 1
        val hi = (m + 1) * PqDsub
        val parts = Seq.newBuilder[String]
        parts += s"""s${m}c0 AS MATERIALIZED (SELECT vec_id AS cluster, dim, el AS cl
          FROM e_rows WHERE vec_id < $PqK AND dim BETWEEN $lo AND $hi)"""
        for (k <- 0 to Iters) {
          parts += s"""s${m}d$k AS MATERIALIZED (
            SELECT e.vec_id, c.cluster, SUM((e.el - c.cl) * (e.el - c.cl)) AS d2
            FROM e_rows e JOIN s${m}c$k c USING (dim) GROUP BY 1, 2),
          s${m}a$k AS MATERIALIZED (
            SELECT vec_id, cluster, d2 FROM (
              SELECT vec_id, cluster, d2,
                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
              FROM s${m}d$k) WHERE rn = 1)"""
          if (k < Iters)
            parts += s"""s${m}c${k + 1} AS MATERIALIZED (
            SELECT a.cluster, e.dim,
              CAST(CASE WHEN SUM(e.el) >= 0
                THEN (2 * SUM(e.el) + COUNT(*)) // (2 * COUNT(*))
                ELSE -((2 * -SUM(e.el) + COUNT(*)) // (2 * COUNT(*))) END AS BIGINT) AS cl
            FROM s${m}a$k a JOIN e_rows e USING (vec_id)
            WHERE e.dim BETWEEN $lo AND $hi
            GROUP BY 1, 2
            UNION ALL
            SELECT cluster, dim, cl FROM s${m}c$k
            WHERE cluster NOT IN (SELECT DISTINCT cluster FROM s${m}a$k))"""
        }
        parts.result().mkString(",\n      ")
      }.mkString(",\n      ")
      val unionAll = (0 until PqM)
        .map(m => s"SELECT vec_id, $m AS sub, cluster, d2 FROM s${m}a$Iters")
        .mkString("\n        UNION ALL ")
      s"""WITH e_rows AS MATERIALIZED (
        SELECT vec_id, t.dim AS dim,
          CAST(CAST(CAST(embedding[t.dim] AS DOUBLE) AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS el
        FROM embeddings, range(1, ${Dim + 1}) t(dim)
        WHERE len(embedding) = $Dim
          AND len(list_filter(embedding, x -> x IS NULL)) = 0),
      $subCtes,
      allc AS (${unionAll})
      SELECT vec_id,
        array_to_string(list(CAST(cluster AS VARCHAR) ORDER BY sub), ',') AS codes,
        CAST(SUM(d2) AS BIGINT) AS err12
      FROM allc GROUP BY vec_id ORDER BY vec_id"""
    },
    s"Product quantization: $PqM-subspace × $PqK-centroid integer-exact " +
      "codebooks (Lloyd's per subspace), per-vector PQ codes + " +
      "reconstruction error, codebook and codes both hash-oracle-checked")

  // --------------------------------------- PCA-reduced clustering
  // The composition Abbas et al. 2023 actually describe (VERDICT r10
  // task 6): whiten/REDUCE the embedding space first, then cluster —
  // k-means over the top-[[SimilarityOps.PcaR]] PCA projections instead
  // of the raw 64 dims. Same integer-exact Lloyd's loop, 8× less
  // distance arithmetic per assignment and 8× smaller centroid state;
  // at 100 TB the reduction is what keeps the |corpus|×K assignment
  // stage affordable.
  //
  // Determinism without an oracle: projections are per-row sequential
  // kernel sums over DRIVER-deterministic (mean, components) — the
  // exact-integer-moment + fixed-pivot-Jacobi pipeline — so they are
  // bit-identical across partitionings and re-learns; quantized to
  // scale-6 longs they feed the same partitioning-invariant integer
  // k-means as q_cluster_kmeans. The Jacobi eigensolve is not
  // SQL-replayable → no_oracle, audited below (retrain consistency +
  // oracle-recomputed n/K scalars).
  /** The PCA-projected scale-6 corpus: (vec_id, sa array<long>[PcaR]). */
  private[graft] def pcaProjectedCorpus(s: SparkSession, d: String)
      : DataFrame = {
    import s.implicits._
    val st = SimilarityOps.pcaModel(s, d)
    val cols = (0 until SimilarityOps.PcaR).map { r =>
      (round(graft.functions.CenteredDot
          .centered_dot($"embedding", st.mean, st.comps(r)), 6)
        .cast("decimal(18,6)") * 1000000L).cast("long")
    }
    Tables.embeddings(s, d)
      .filter($"embedding".isNotNull && size($"embedding") === Dim &&
        !exists($"embedding", _.isNull))
      .select($"vec_id", array(cols: _*).as("sa"))
      .cache()
  }

  /** One full train+stats pass in the projected space — shared by the
    * declared query and the audit's retrain-consistency check. */
  private def pcaKmeansRun(s: SparkSession, d: String)
      : (Seq[(Long, Array[Long])], DataFrame) = {
    import s.implicits._
    val sv = pcaProjectedCorpus(s, d)
    val k = effectiveK(sv.count())
    val cents = fitCentroids(s, sv, k)
    val stats = assign(s, sv, cents)
      .groupBy($"cluster")
      .agg(count(lit(1)).as("n_vecs"), sum($"d2").as("sse12"))
      .localCheckpoint()
    sv.unpersist(false)
    (cents, stats)
  }

  private val clusterPcaKmeans = QueryDef(
    "q_cluster_pca_kmeans",
    (s, d) => {
      import s.implicits._
      val (cents, stats) = pcaKmeansRun(s, d)
      val cnorm = cents.map { case (c, a) => (c, a.map(math.abs).sum) }
        .toDF("cluster", "cnorm1_6")
      cnorm.join(broadcast(stats), Seq("cluster"), "left")
        .select($"cluster",
          coalesce($"n_vecs", lit(0L)).as("n_vecs"),
          coalesce($"sse12", lit(0L)).as("sse12"),
          $"cnorm1_6")
        .orderBy($"cluster")
    },
    None,
    s"Reduce-then-cluster (Abbas 2023): k-means in the PCA-projected " +
      s"${SimilarityOps.PcaR}-dim space — integer-exact Lloyd's over " +
      "deterministic scale-6 projections, audited (Jacobi not in SQL)")

  private val clusterPcaKmeansAudit = QueryDef(
    "q_cluster_pca_kmeans_audit",
    (s, d) => {
      import s.implicits._
      val (c1, s1) = pcaKmeansRun(s, d)
      val (c2, s2) = pcaKmeansRun(s, d)
      // retrain consistency: a SECOND full projection+training pass
      // must reproduce the centroids bit-for-bit (integer k-means over
      // deterministic projections) and the same assignment stats
      val centsSame = c1.map { case (c, a) => (c, a.toSeq) } ==
        c2.map { case (c, a) => (c, a.toSeq) }
      val statsSame = s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty
      val k = c1.size.toLong
      // oracle-recomputable scalars: valid-vector count and the
      // K = clamp(ceil(sqrt(n))) rule the run actually used
      Tables.embeddings(s, d)
        .filter($"embedding".isNotNull && size($"embedding") === Dim &&
          !exists($"embedding", _.isNull))
        .agg(count(lit(1)).as("n_vectors"))
        .select($"n_vectors",
          greatest(lit(8L), least(lit(4096L),
            ceil(sqrt($"n_vectors")).cast("long"))).as("k"),
          when(greatest(lit(8L), least(lit(4096L),
              ceil(sqrt($"n_vectors")).cast("long"))) === k, 1L)
            .otherwise(0L).as("k_matches_rule_ok"),
          lit(if (centsSame) 1L else 0L).as("retrain_centroids_ok"),
          lit(if (statsSame) 1L else 0L).as("retrain_stats_ok"))
    },
    Some("""SELECT CAST(count(*) AS BIGINT) AS n_vectors,
        CAST(GREATEST(8, LEAST(4096, CAST(ceil(sqrt(count(*))) AS BIGINT)))
          AS BIGINT) AS k,
        CAST(1 AS BIGINT) AS k_matches_rule_ok,
        CAST(1 AS BIGINT) AS retrain_centroids_ok,
        CAST(1 AS BIGINT) AS retrain_stats_ok
      FROM embeddings
      WHERE embedding IS NOT NULL AND len(embedding) = 64
        AND len(list_filter(embedding, x -> x IS NULL)) = 0"""),
    "PCA-kmeans audit: retrain reproducibility flags (bit-identical " +
      "centroids and assignment stats across two full passes) with " +
      "n/K scalars oracle-recomputed")

  override def defs: Seq[QueryDef] =
    Seq(clusterKmeans, clusterSemdedup, embedPq,
      clusterPcaKmeans, clusterPcaKmeansAudit)
}
