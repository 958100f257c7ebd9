package graft.operators

import graft.{QueryDef, QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float unit
  * vectors — cosine ≡ dot product on this corpus).
  *
  * Two paths, per the blueprint:
  *  - brute-force top-k against a small broadcast query set — the exact
  *    baseline. Scored map-side (queries broadcast, zero shuffle of the
  *    corpus), then a TWO-PHASE top-k: per-partition heads first, then a
  *    global head over (queries × partitions × k) rows only — the full
  *    scored corpus never shuffles.
  *  - SRP-LSH bucketed ANN — signature = sign pattern against 8 fixed
  *    hyperplanes; candidates share the query's bucket; exact rerank on
  *    the bucket only. This is the 100 TB path: bucket sizes are ~N/256
  *    and the join is a hash join on the signature.
  *
  * The exact query ranks by decimal dot product (bit-stable across
  * engines, hence DuckDB-oracle-able); the ANN query uses double cosine
  * (verified in the spec against the exact baseline, no hash oracle).
  */
object SimilarityOps extends QueryPack {

  private[graft] val K = 5
  private[graft] val NQ = 10 // query vectors: vec_id < NQ

  /** Exact decimal dot product — custom expression (one tight loop per
    * row; the equivalent zip_with/aggregate chain evaluates interpreted
    * and was ~5× slower scoring |queries| × |corpus| pairs). */
  private def dotDec(a: Column, b: Column): Column =
    graft.functions.DecimalDot.decimal_dot(a, b)

  // --------------------------------------------- exact brute-force top-k
  /** Exact decimal top-K per query vector (also the ANN audits' ground
    * truth). Each vector's exact scale-6 decimal form is materialized
    * ONCE (decimal_scale6) before the scoring join, so the |queries| ×
    * |corpus| hot loop is pure long multiply-adds — bit-identical to
    * scoring with decimal_dot, several times faster (the per-pair
    * BigDecimal conversions were the dominant cost).
    *
    * The top-k itself is the bounded-heap aggregate
    * ([[graft.functions.TopKPairs]], rank order (dot DESC, cid ASC)):
    * the scored stream is consumed on the fly by a partial aggregate
    * holding k candidates per (query, partition) — it is never sorted,
    * shuffled, or spilled. The previous two-phase rank-window formulation
    * sorted the full |queries| × |corpus| stream inside each task; at the
    * 10× stress scale (400M scored rows) that sort's spill was the whole
    * query's GC lottery (5.7–160 s draws, BENCH_NOTES round 8). */
  private[graft] def exactTopK(s: SparkSession, d: String): DataFrame = {
      import s.implicits._
      import graft.functions.ScaledDot.{decimal_scale6, scaled_dot}
      val emb = Tables.embeddings(s, d)
        .select($"vec_id", decimal_scale6($"embedding").as("sv"))
      val queries = emb.filter($"vec_id" < NQ)
        .select($"vec_id".as("qid"), $"sv".as("qvec"))
      val scored = emb.select($"vec_id".as("cid"), $"sv".as("cvec"))
        .join(broadcast(queries))
        .filter($"qid" =!= $"cid")
        .select($"qid", $"cid", scaled_dot($"qvec", $"cvec").as("dot"))
      scored
        .groupBy($"qid")
        .agg(graft.functions.TopKPairs.top_k_pairs($"dot", $"cid", K).as("tk"))
        .select($"qid", posexplode($"tk"))
        .select($"qid", $"col.id".as("cid"),
          // ranking decided on the exact decimal dot; ship as double
          $"col.score".cast("double").as("dot"),
          ($"pos" + 1).cast("long").as("rank"))
        .orderBy($"qid", $"rank")
  }

  private val simsearchCosine = QueryDef(
    "q_simsearch_cosine",
    (s, d) => exactTopK(s, d),
    Some(s"""SELECT q.vec_id AS qid, c.vec_id AS cid,
      CAST(CAST(round(list_sum(list_transform(range(1, 65),
        i -> CAST(CAST(CAST(q.embedding[i] AS DOUBLE) AS DECIMAL(18,6))
           * CAST(CAST(c.embedding[i] AS DOUBLE) AS DECIMAL(18,6)) AS DECIMAL(20,12)))), 6)
        AS DECIMAL(38,6)) AS DOUBLE) AS dot,
      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        CAST(round(list_sum(list_transform(range(1, 65),
          i -> CAST(CAST(CAST(q.embedding[i] AS DOUBLE) AS DECIMAL(18,6))
             * CAST(CAST(c.embedding[i] AS DOUBLE) AS DECIMAL(18,6)) AS DECIMAL(20,12)))), 6)
          AS DECIMAL(38,6)) DESC, c.vec_id) AS rank
      FROM embeddings q JOIN embeddings c ON q.vec_id < $NQ AND q.vec_id <> c.vec_id
      QUALIFY rank <= $K
      ORDER BY qid, rank"""),
    "Exact top-k neighbor search: broadcast queries, decimal dot, 2-phase top-k")

  // ------------------------------------------------------ SRP-LSH ANN
  /** Fixed seed for every SRP hyperplane family in this pack. */
  private[graft] val SrpSeed = 20240101L

  /** 8-bit SRP signature (single band): bit k set iff dot(v, plane_k) > 0.
    * Codegen'd one-pass kernel ([[graft.functions.SrpSig]]); same seed ⇒
    * same plane stream ⇒ same buckets as the original interpreted
    * zip_with/aggregate formulation it replaced. */
  private def srpSig(v: Column): Column =
    graft.functions.SrpSig.srp_sig(v, 1, 8, SrpSeed).getItem(0)

  /** IEEE-double dot (codegen'd kernel) — the ANN rerank scorer. */
  private def cosDouble(a: Column, b: Column): Column =
    graft.functions.DoubleDot.double_dot(a, b)

  /** The SRP-LSH bucket-probe ANN result (audit subject). Top-k per query
    * via the bounded-heap aggregate (no rank-window sort of the bucket
    * stream — a bucket holds ~N/256 of the corpus, which at 100 TB is far
    * too much to sort per query). Empty-bucket queries survive as a
    * (cid NULL, cos NULL, rank NULL) row via posexplode_outer — same row
    * count as the previous rank-window formulation. */
  private[graft] def srpAnnResults(s: SparkSession, d: String): DataFrame = {
      import s.implicits._
      val sigs = Tables.embeddings(s, d)
        .select($"vec_id", $"embedding", srpSig($"embedding").as("sig"))
      val queries = sigs.filter($"vec_id" < NQ)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"), $"sig".as("qsig"))
      broadcast(queries)
        .join(sigs.select($"vec_id".as("cid"), $"embedding".as("cvec"), $"sig"),
          $"qsig" === $"sig" && $"qid" =!= $"cid", "left")
        .select($"qid", $"qsig", $"cid",
          round(cosDouble($"qvec", $"cvec"), 6).as("cos"))
        .groupBy($"qid", $"qsig")
        .agg(graft.functions.TopKPairs.top_k_pairs($"cos", $"cid", K).as("tk"))
        .select($"qid", $"qsig", posexplode_outer($"tk"))
        .select($"qid", $"qsig", $"col.id".as("cid"), $"col.score".as("cos"),
          ($"pos" + 1).cast("long").as("rank"))
        .orderBy($"qid", $"rank")
  }

  private val simsearchAnn = QueryDef(
    "q_simsearch_ann_srp",
    (s, d) => srpAnnResults(s, d),
    None,
    "ANN via 8-bit SRP-LSH bucket probe + exact rerank (left join keeps " +
      "queries with empty buckets)")

  // ------------------------------------------- embedding near-dup audit
  // Multi-band SRP LSH (MinHash-style banding): each vector gets
  // DedupBands signatures of DedupBits sign bits; candidates are pairs
  // sharing ANY band's bucket (OR across bands), then exact-cosine
  // verified at >= 0.9 (double — threshold far from any fixture value, so
  // the comparison is stable). Unlike a single wide bucket join, pair
  // work is bounded by BAND-BUCKET population (~N/2^bits per bucket ⇒
  // Σ bucket² ≈ bands·N²/2^bits with 2^16 buckets per band) and recall is
  // restored by the band OR — the standard LSH recall/cost dial.
  private[graft] val DedupBands = 8
  private[graft] val DedupBits = 16
  private[graft] val NearDupCos = 0.9

  /** OR-ed LSH candidates + exact cosine verify: the near-dup PAIR set.
    * Exposed for the spec, which proves it equal to brute-force all-pairs
    * cosine on a corpus with planted near-dups. `vecs` must carry
    * (vec_id, embedding). */
  private[graft] def embeddingNearDupPairs(vecs: DataFrame): DataFrame = {
    val sigs = vecs.select(col("vec_id"), col("embedding"),
      posexplode(graft.functions.SrpSig.srp_sig(
        col("embedding"), DedupBands, DedupBits, SrpSeed)).as(Seq("band", "sig")))
    sigs.as("a")
      .join(sigs.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        col("a.embedding").as("va"), col("b.embedding").as("vb"))
      .dropDuplicates("id_a", "id_b") // OR across bands: verify each pair once
      .withColumn("cos", round(cosDouble(col("va"), col("vb")), 6))
      .filter(col("cos") >= NearDupCos)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  private val dedupEmbedding = QueryDef(
    "q_dedup_embedding",
    (s, d) => {
      import s.implicits._
      val emb = Tables.embeddings(s, d).select($"vec_id", $"embedding")
      val sigs = emb.select($"vec_id",
        posexplode(graft.functions.SrpSig.srp_sig(
          $"embedding", DedupBands, DedupBits, SrpSeed)).as(Seq("band", "sig")))
      // per-band bucket audit: candidate-pair work is computable from
      // bucket populations alone (Σ c·(c−1)/2), no pair join needed
      val buckets = sigs.groupBy($"band", $"sig").agg(count("*").as("c"))
      val audit = buckets.groupBy($"band").agg(
        count("*").as("n_buckets"),
        max($"c").as("max_bucket"),
        sum($"c" * ($"c" - 1) / 2).cast("long").as("n_cand_pairs"))
      // total verified near-dups (OR-ed across bands), as a constant
      // column — the audit is 'bands' rows at ANY corpus size
      val nd = embeddingNearDupPairs(emb).agg(count("*").as("n_neardups"))
      audit.join(broadcast(nd))
        .select($"band", $"n_buckets", $"max_bucket", $"n_cand_pairs",
          $"n_neardups")
        .orderBy($"band")
    },
    None,
    "Embedding near-dup audit: multi-band SRP-LSH buckets, OR-ed " +
      "candidates, exact cosine verify")

  // ---------------------------------------------------------- IVF ANN
  /** Deterministic k-means coarse quantizer: init = first k sample
    * vectors (no RNG), fixed Lloyd iterations, trained driver-side on a
    * small sample — the standard IVF pattern (the quantizer is tiny and
    * trained offline; only assignment is distributed). */
  private[graft] def kmeansFit(
      sample: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    val dim = sample.head.length
    var cents = sample.take(k).map(_.clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val cnts = new Array[Long](k)
      sample.foreach { v =>
        val c = nearestCentroid(cents, v)
        cnts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      cents = Array.tabulate(k) { c =>
        if (cnts(c) == 0) cents(c)
        else { val s = sums(c); var i = 0
          while (i < dim) { s(i) /= cnts(c); i += 1 }; s }
      }
    }
    cents
  }

  // Same dimension convention as the codegen kernel (NearestCentroid
  // .nearest clamps to min(|v|, |centroid|)) so driver-side assignment
  // and distributed assignment agree STRUCTURALLY, not just on fixtures
  // whose dims happen to match (ADVICE r4).
  private[graft] def nearestCentroid(
      cents: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < cents.length) {
      var d = 0.0; var i = 0
      val cent = cents(c)
      val dim = math.min(v.length, cent.length)
      while (i < dim) { val t = v(i) - cent(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private[graft] def probeLists(
      cents: Array[Array[Double]], v: Array[Double], nprobe: Int): Seq[Int] = {
    cents.indices.map { c =>
      var d = 0.0; var i = 0
      val dim = math.min(v.length, cents(c).length)
      while (i < dim) { val t = v(i) - cents(c)(i); d += t * t; i += 1 }
      (d, c)
    }.sortBy(x => (x._1, x._2)).take(nprobe).map(_._2)
  }

  /** IVF index parameters: list count scales with the corpus (VERDICT r8
    * task 6 — N/K per-list probe cost only stays sublinear if K grows;
    * FAISS practice is K ≈ √N lists), probe 2, train on a BOUNDED
    * sample. The floor keeps fixture behavior stable; the cap is the
    * training-sample size (seeding needs k distinct sample vectors). */
  private[graft] def ivfK(n: Long): Int =
    math.max(16, math.min(IvfSampleCap,
      math.ceil(math.sqrt(n.toDouble)).toInt))
  private val IvfIters = 5
  private val IvfNProbe = 2
  private[graft] val IvfSampleCap = 4096

  /** Deterministic, bounded k-means training sample: top-IvfSampleCap rows
    * by (xxhash64(vec_id), vec_id) — a pseudorandom but stable subset,
    * fetched as a distributed TakeOrdered (no full shuffle) and capped at
    * a few thousand rows REGARDLESS of corpus size, so the driver-side
    * collect stays kilobytes-to-megabytes at 100 TB. */
  private[graft] def ivfTrainingSample(
      s: SparkSession, d: String): Array[Array[Double]] = {
    import s.implicits._
    Tables.embeddings(s, d)
      .select($"vec_id", $"embedding")
      .orderBy(xxhash64($"vec_id"), $"vec_id")
      .limit(IvfSampleCap)
      .select($"embedding").as[Seq[Float]]
      .collect().map(_.map(_.toDouble).toArray)
  }

  /** The IVF probe result (audit subject). */
  private[graft] def ivfResults(s: SparkSession, d: String): DataFrame = {
      import s.implicits._
      val emb = Tables.embeddings(s, d).select($"vec_id", $"embedding")
      val sample = ivfTrainingSample(s, d)
      // an empty embeddings table has no quantizer to train — fail with
      // the semantic error, not a div-by-zero deep in kmeansFit (ADVICE r9)
      require(sample.nonEmpty,
        s"IVF needs at least one embedding vector in $d")
      // corpus size for the ceil(sqrt(N)) list count: when the bounded
      // training sample came back under its cap it IS the whole corpus,
      // so the extra count scan only runs for corpora past the cap
      val n = if (sample.length < IvfSampleCap) sample.length.toLong
              else emb.count()
      val k = math.min(ivfK(n), sample.length)
      val cents = kmeansFit(sample, k, IvfIters)
      // distributed assignment: codegen kernel over Tungsten rows — the
      // corpus never deserializes; the quantizer (k*dim doubles —
      // kilobytes) is a bound reference object in the generated code
      // the rerank scorer consumes each vector's ONE-TIME exact scale-6
      // form (see exactTopK) — the per-candidate loop is long multiply-adds
      val assigned = emb.select(
        $"vec_id".as("cid"),
        graft.functions.ScaledDot.decimal_scale6($"embedding").as("cvec"),
        graft.functions.NearestCentroid.nearest_centroid($"embedding", cents)
          .as("list"))
      // one row per (query, probed list): the probe becomes an EQUI join
      // key — a broadcast hash join on `list`, not a nested-loop scan of
      // every query per candidate (matters once |queries| grows).
      // Column filter BEFORE the typed view: the NQ-row fetch prunes at
      // the parquet scan instead of decoding the whole corpus.
      val queries = emb.filter($"vec_id" < NQ)
        .as[(Long, Seq[Float])].collect().toSeq.flatMap {
          case (id, v) =>
            probeLists(cents, v.map(_.toDouble).toArray, IvfNProbe)
              .map(p => (id, graft.functions.ScaledDot.scale6(v), p))
        }.toDF("qid", "qvec", "list")
      // top-k per query via the bounded-heap aggregate — the probed
      // candidate stream (|queries| × N·nprobe/lists rows at scale) is
      // never sorted. The heap id packs (cid, list) into one long
      // (list < k); unpacking after the explode restores both columns,
      // and the packed order is monotone in cid (each cid appears in at
      // most one list), so the (dot DESC, cid ASC) tie-break is preserved.
      broadcast(queries)
        .join(assigned, Seq("list"))
        .filter($"qid" =!= $"cid")
        .select($"qid",
          ($"cid" * lit(k.toLong) + $"list".cast("long")).as("packed"),
          graft.functions.ScaledDot.scaled_dot($"qvec", $"cvec").as("dot"))
        .groupBy($"qid")
        .agg(graft.functions.TopKPairs.top_k_pairs($"dot", $"packed", K).as("tk"))
        .select($"qid", posexplode($"tk"))
        .select($"qid",
          expr(s"CAST(col.id div $k AS BIGINT)").as("cid"),
          expr(s"CAST(col.id % $k AS INT)").as("list"),
          $"col.score".cast("double").as("dot"),
          ($"pos" + 1).cast("long").as("rank"))
        .orderBy($"qid", $"rank")
  }

  private val simsearchIvf = QueryDef(
    "q_simsearch_ivf",
    (s, d) => ivfResults(s, d),
    None,
    "IVF ANN: deterministic k-means coarse quantizer (ceil(sqrt(N)) " +
      "lists), nprobe=2 probe, exact decimal rerank")

  // ---------------------------------------------------------- IVF-PQ
  // The production billion-vector index shape (Jégou et al. 2011; the
  // FAISS IVFPQ composition): the coarse quantizer above limits the scan
  // to nprobe lists, and PRODUCT QUANTIZATION compresses every candidate
  // to M subspace codes so the probed lists are scanned by TABLE LOOKUP
  // (asymmetric distance computation, ADC) instead of full-vector
  // arithmetic — at 100 TB the lists hold codes (M bytes/vector), not
  // vectors (dim×4 bytes), which is the difference between an index that
  // fits executor memory and one that doesn't.
  //
  // Training is the FAISS offline shape: coarse centroids AND the M
  // per-subspace residual codebooks all fit in kilobytes and train
  // driver-side on the same bounded sample (the corpus never collects).
  // Distributed work is (a) the encode — coarse assign (codegen kernel),
  // residual against the k-row broadcast centroid table, M sub-assigns
  // (same kernel on the residual slices), all map-side; (b) the ADC scan
  // — candidates equi-join the broadcast (query, probed list, LUT) rows
  // on `list`, the distance is M element_at lookups on the LUT ATTRIBUTE
  // (never a recomputed expression — the HOF-inlining trap), and top-k
  // is the bounded-heap aggregate, so the probed stream is never sorted.
  private[graft] val IvfPqM = 4
  // 8-bit sub-codebooks — the FAISS default; one byte per code at
  // production dims. K=16 (4-bit) halved fixture recall (6/50 vs 11-12/50
  // of the exact top-K) for no meaningful memory win.
  private[graft] val IvfPqK = 256

  /** M per-subspace codebooks trained on the sample's coarse residuals.
    * The per-subspace centroid count clamps to the sample size (the same
    * guard the coarse quantizer's k takes — kmeansFit seeds from the
    * first k sample vectors and would index past the end otherwise). */
  private[graft] def pqBooks(sample: Array[Array[Double]],
      cents: Array[Array[Double]], dsub: Int): Array[Array[Array[Double]]] = {
    val kSub = math.min(IvfPqK, sample.length)
    val resid = sample.map { v =>
      val c = cents(nearestCentroid(cents, v))
      Array.tabulate(v.length)(i => v(i) - c(i))
    }
    Array.tabulate(IvfPqM) { m =>
      kmeansFit(resid.map(_.slice(m * dsub, (m + 1) * dsub)), kSub, IvfIters)
    }
  }

  /** The IVF-PQ ADC probe result (audit subject). */
  private[graft] def ivfpqResults(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d).select($"vec_id", $"embedding")
    val sample = ivfTrainingSample(s, d)
    require(sample.nonEmpty,
      s"IVF-PQ needs at least one embedding vector in $d")
    val n = if (sample.length < IvfSampleCap) sample.length.toLong
            else emb.count()
    val k = math.min(ivfK(n), sample.length)
    val cents = kmeansFit(sample, k, IvfIters)
    val dim = sample.head.length
    val dsub = dim / IvfPqM
    val books = pqBooks(sample, cents, dsub)
    val kSub = books.head.length // = min(IvfPqK, sample size)
    // distributed encode. Residuals are float (the stored-code precision
    // PQ quantizes anyway); the spec replays this float arithmetic
    // exactly. The M sliced sub-assigns re-evaluate the zip_with after
    // projection collapse — M×dim subtractions per row, dwarfed by the
    // k×dim coarse assignment in the same stage.
    val centDf = cents.zipWithIndex
      .map { case (c, i) => (i, c.map(_.toFloat).toSeq) }
      .toSeq.toDF("list", "cent")
    val coded = emb.select($"vec_id".as("cid"), $"embedding",
        graft.functions.NearestCentroid.nearest_centroid($"embedding", cents)
          .as("list"))
      .join(broadcast(centDf), Seq("list"))
      .withColumn("resid",
        zip_with($"embedding", $"cent", (x, c) => (x - c).cast("float")))
      .select($"list" +: $"cid" +: (0 until IvfPqM).map { m =>
        graft.functions.NearestCentroid.nearest_centroid(
          slice($"resid", m * dsub + 1, dsub), books(m)).as(s"c$m")
      }: _*)
    // query-side: NQ rows; one (qid, list, LUT) row per probed list with
    // LUT[m*kSub+j] = ||(q − cent_list)_m − book_m[j]||² — M×kSub
    // doubles per probe, computed driver-side (kilobytes at any corpus
    // size)
    val queries = emb.filter($"vec_id" < NQ)
      .as[(Long, Seq[Float])].collect().toSeq.flatMap { case (qid, qv) =>
        val q = qv.map(_.toDouble).toArray
        probeLists(cents, q, IvfNProbe).map { list =>
          val lut = Array.tabulate(IvfPqM * kSub) { x =>
            val m = x / kSub; val j = x % kSub
            var dd = 0.0; var i = 0
            while (i < dsub) {
              val t = (q(m * dsub + i) - cents(list)(m * dsub + i)) -
                books(m)(j)(i)
              dd += t * t; i += 1
            }
            dd
          }
          (qid, list, lut.toSeq)
        }
      }.toDF("qid", "list", "lut")
    val adc = (0 until IvfPqM).map { m =>
      element_at($"lut", col(s"c$m") + lit(m * kSub + 1))
    }.reduce(_ + _)
    broadcast(queries).join(coded, Seq("list"))
      .filter($"qid" =!= $"cid")
      .select($"qid", $"cid", adc.as("adist"))
      .groupBy($"qid")
      // rank by quantized distance ASC (negate for the max-heap),
      // ties toward the lower cid — deterministic
      .agg(graft.functions.TopKPairs.top_k_pairs(-$"adist", $"cid", K).as("tk"))
      .select($"qid", posexplode($"tk"))
      .select($"qid", $"col.id".as("cid"),
        (-$"col.score").cast("double").as("adist"),
        ($"pos" + 1).cast("long").as("rank"))
      .orderBy($"qid", $"rank")
  }

  private val simsearchIvfPq = QueryDef(
    "q_simsearch_ivfpq",
    (s, d) => ivfpqResults(s, d),
    None,
    s"IVF-PQ ANN: coarse quantizer + $IvfPqM×$IvfPqK residual product " +
      "codebooks, ADC table-lookup scan of the probed lists")

  // --------------------------------------------- embedding norms
  // Vector hygiene op every embedding pipeline needs: exact squared L2
  // norm per vector (decimal self-dot — the corpus is unit-norm, so this
  // doubles as the normalization audit). Pure map stage.
  private val embedNorm = QueryDef(
    "q_embed_norm",
    (s, d) => {
      import s.implicits._
      Tables.embeddings(s, d)
        .select($"vec_id",
          dotDec($"embedding", $"embedding").cast("double").as("norm2"))
        .orderBy($"vec_id")
    },
    Some("""SELECT vec_id,
      CAST(CAST(round(list_sum(list_transform(range(1, 65),
        i -> CAST(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(18,6))
           * CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(18,6)) AS DECIMAL(20,12)))), 6)
        AS DECIMAL(38,6)) AS DOUBLE) AS norm2
      FROM embeddings ORDER BY vec_id"""),
    "Exact squared-L2 norm audit over the embedding corpus")

  // --------------------------------------- exact Gram (second-moment) matrix
  // Distributed linear algebra the embedding tier feeds on: G = Σ_v
  // sa(v)·sa(v)^T over the scale-6 integer vectors — the X^T X
  // building block of PCA/whitening (the step SemDeDup-class pipelines
  // run before clustering). Upper triangle only (G is symmetric):
  // dim·(dim+1)/2 = 2080 output cells at dim 64.
  //
  // Plan shape: one pass — each vector pipelines through a Generate of
  // its upper-triangle index pairs straight into a partial HashAggregate
  // keyed by (i, j); only the 2080-group partials shuffle. The Generate
  // inflation is transient (whole-stage codegen, never materialized), so
  // at 100 TB the cost is the multiply count itself plus a 2080-row
  // exchange. Element products fit a long (≤10¹²); the cross-vector sums
  // accumulate as DECIMAL(38,0) so no corpus size can overflow them —
  // the declared output is BIGINT, which holds to ~9·10¹⁸ (≈10⁶ vectors
  // at this scale); past that a pipeline ships the decimal itself.
  private val GramDim = graft.operators.ClusterOps.Dim

  /** Valid scale-6 vectors — the Gram aggregate's input. */
  private def gramInput(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, d)
      .filter($"embedding".isNotNull && size($"embedding") === GramDim &&
        !exists($"embedding", _.isNull))
      .select(graft.functions.ScaledDot.decimal_scale6($"embedding").as("sa"))
  }

  /** Declarative twin of the gram_agg kernel — spec-only bit-identity
    * reference (the QualityModelScore convention): double posexplode of
    * the upper triangle into (i, j, product) rows, aggregated exactly.
    * ~60 ns/product of Generate/boxing overhead at the 10× stress scale
    * (5.2 s vs the kernel's tight long loop), which is why the declared
    * query runs the kernel. */
  private[graft] def gramDeclarative(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    gramInput(s, d)
      .select($"sa", posexplode($"sa").as(Seq("i0", "xi")))
      .select($"i0", $"xi",
        posexplode(slice($"sa", $"i0" + 1, lit(GramDim) - $"i0")).as(Seq("p", "xj")))
      .select(($"i0" + 1).as("i"), ($"i0" + 1 + $"p").as("j"),
        ($"xi" * $"xj").cast("decimal(38,0)").as("prod"))
      .groupBy($"i", $"j")
      .agg(count(lit(1)).as("n"), sum($"prod").as("sdec"))
      .select($"i".cast("long").as("i"), $"j".cast("long").as("j"),
        $"n", $"sdec".cast("long").as("s"))
      .orderBy($"i", $"j")
  }

  private val embedGram = QueryDef(
    "q_embed_gram",
    (s, d) => {
      import s.implicits._
      // (p → (i, j)) for the flattened upper triangle: a 2080-row local
      // relation joined broadcast — exact, no float index arithmetic
      val idx = (for (i <- 1 to GramDim; j <- i to GramDim) yield (i, j))
        .zipWithIndex.map { case ((i, j), p) => (p, i.toLong, j.toLong) }
        .toDF("pos", "i", "j")
      gramInput(s, d)
        .agg(graft.functions.GramAggregate.gram_agg($"sa", GramDim).as("g"))
        // degenerate-corpus guard (ADVICE r10): a global aggregate over
        // zero valid vectors still emits its initial buffer — a full
        // 2080-row zero triangle — while the oracle's GROUP BY over the
        // empty cross join returns no rows. Drop the n=0 triangle so
        // both engines agree that an empty corpus has no Gram matrix.
        .filter($"g.n" > 0)
        .select($"g.n".as("n"), posexplode($"g.cells").as(Seq("pos", "s")))
        .join(broadcast(idx), "pos")
        .select($"i", $"j", $"n", $"s")
        .orderBy($"i", $"j")
    },
    Some(s"""WITH e AS (
        SELECT list_transform(embedding,
          x -> CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS sa
        FROM embeddings
        WHERE len(embedding) = $GramDim
          AND len(list_filter(embedding, x -> x IS NULL)) = 0)
      SELECT CAST(t.i AS BIGINT) AS i, CAST(u.j AS BIGINT) AS j,
        CAST(count(*) AS BIGINT) AS n,
        CAST(SUM(sa[t.i] * sa[u.j]) AS BIGINT) AS s
      FROM e, range(1, ${GramDim + 1}) t(i), range(1, ${GramDim + 1}) u(j)
      WHERE u.j >= t.i
      GROUP BY 1, 2 ORDER BY i, j"""),
    "Exact integer Gram matrix over the scale-6 embedding corpus: one " +
      "pipelined pass, 2080-group map-side aggregation — the PCA/" +
      "whitening building block")

  // --------------------------------------------------- PCA projection
  // The whitening step SemDeDup-class pipelines run before clustering
  // (Abbas et al. 2023 cluster in an embedding space; production stacks
  // PCA-reduce first): top-[[PcaR]] principal components of the
  // embedding covariance, each vector projected onto them.
  //
  // Composition shape: covariance assembles EXACTLY from two bounded
  // aggregates — the [[embedGram]] second-moment buffer and a 64-cell
  // first-moment sum — so the driver-side eigensolve starts from
  // integers, not from float accumulation order. The eigensolver is
  // cyclic Jacobi with a FIXED pivot order and only +,−,×,/ and
  // Math.sqrt (all IEEE-correctly-rounded), so the decomposition is
  // bit-deterministic for a given corpus; eigenvectors canonicalize
  // sign (largest-|component| positive) and order (eigenvalue DESC,
  // index ASC). Projection is a pure map against the broadcast
  // component matrix — one scan, zero shuffles beyond the presentation
  // sort. EM-free but float-valued, so no SQL oracle: the audit pins
  // engine-side invariants (orthonormality, eigen-residuals,
  // per-component variance ≈ eigenvalue) with oracle-recomputed
  // scalars, and the spec re-derives every invariant locally.
  private[graft] val PcaR = 8

  /** Deterministic cyclic-Jacobi symmetric eigensolve: returns
    * (eigenvalues, eigenvectors as rows), ordered (λ DESC, index ASC),
    * sign-canonicalized. `a` is mutated. */
  private[graft] def jacobiEigen(a: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val n = a.length
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 50 && off > 1e-14) {
      off = 0.0
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            off = math.max(off, math.abs(apq))
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(1.0 + theta * theta))
              else 1.0 / (theta - math.sqrt(1.0 + theta * theta))
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = t * c
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vpk = v(p)(k); val vqk = v(q)(k)
              v(p)(k) = c * vpk - s * vqk
              v(q)(k) = s * vpk + c * vqk
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(i => (-a(i)(i), i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = order.map { i =>
      val row = v(i)
      // sign canon: the largest-|x| component (first on ties) positive
      var best = 0
      var j = 1
      while (j < n) {
        if (math.abs(row(j)) > math.abs(row(best))) best = j
        j += 1
      }
      if (row(best) < 0) row.map(x => -x) else row.clone()
    }.toArray
    (evals, evecs)
  }

  /** (n, mean vector, top-R eigenpairs) of the embedding covariance —
    * assembled from the two exact integer aggregates. */
  /** The learned PCA state: (n, mean, covariance, top-R eigenvalues,
    * top-R components). The COVARIANCE rides along so the audit's
    * residual check reuses it instead of re-running the Gram aggregate
    * it was derived from. */
  private[graft] final case class PcaState(n: Long, mean: Array[Double],
      cov: Array[Array[Double]], evals: Array[Double],
      comps: Array[Array[Double]])

  // memoized per (context, corpus, fingerprint) — driver-local arrays
  // only, the learnBpe/learnUnigram convention: the model trains once
  // per corpus and is read by q_embed_pca, its audit, and the specs
  private val pcaMemo = new graft.Memo.Bounded[
    (String, String, String), PcaState](cap = 4, onEvict = _ => ())
  private[graft] def pcaModel(s: SparkSession, d: String): PcaState =
    pcaMemo.getOrElseUpdate((s.sparkContext.applicationId, d,
      graft.FixtureStamp.stamp("pca1", d, "embeddings"))) {
      import s.implicits._
      val dim = GramDim
      val gram = gramInput(s, d)
        .agg(graft.functions.GramAggregate.gram_agg($"sa", dim).as("g"),
          graft.functions.SumVector.sum_vector($"sa", dim).as("m"))
        .as[((Long, Seq[Long]), Seq[Long])].collect().head
      val ((n, cells), m1) = gram
      require(n > 0, s"PCA needs at least one valid embedding vector in $d")
      val mean = m1.map(_.toDouble / 1e6 / n).toArray
      // covariance: E[x_i x_j] − μ_i μ_j from the exact integer moments
      val c = Array.ofDim[Double](dim, dim)
      var p = 0
      for (i <- 0 until dim; j <- i until dim) {
        val eij = cells(p).toDouble / 1e12 / n
        val cij = eij - mean(i) * mean(j)
        c(i)(j) = cij; c(j)(i) = cij
        p += 1
      }
      // jacobiEigen mutates its input — keep the covariance for the audit
      val work = c.map(_.clone())
      val (evals, evecs) = jacobiEigen(work)
      PcaState(n, mean, c, evals.take(PcaR), evecs.take(PcaR))
    }

  private val embedPca = QueryDef(
    "q_embed_pca",
    (s, d) => {
      import s.implicits._
      val st = pcaModel(s, d)
      val (mean, comps) = (st.mean, st.comps)
      // projection: p_r = Σ_i (x_i − μ_i)·v_ri, a pure map against the
      // broadcast R×dim component matrix (codegen kernel per component)
      val x = Tables.embeddings(s, d)
        .filter($"embedding".isNotNull && size($"embedding") === GramDim &&
          !exists($"embedding", _.isNull))
      val cols = (0 until PcaR).map { r =>
        round(graft.functions.CenteredDot
          .centered_dot($"embedding", mean, comps(r)), 6).as(s"p$r")
      }
      x.select($"vec_id" +: cols: _*).orderBy($"vec_id")
    },
    None,
    s"PCA projection onto the top $PcaR covariance components — exact " +
      "integer moments, deterministic Jacobi eigensolve, map-side " +
      "projection")

  // The audit re-proves the decomposition from the engine side:
  //   ortho_ok:    max |V·Vᵀ − I| ≤ 1e-8 over the R×R products
  //                (driver-exact, like the k-means training audit);
  //   resid_ok:    max ‖C·v_r − λ_r·v_r‖∞ ≤ 1e-8·(1+|λ_r|);
  //   var_ok:      distributed Var(p_r) within 1e-3 relative of λ_r for
  //                every component (loose enough for double-sum
  //                reordering noise, tight enough to catch a wrong
  //                eigenpair outright).
  // n_vectors/dim are oracle-recomputed.
  private val pcaAudit = QueryDef(
    "q_embed_pca_audit",
    (s, d) => {
      import s.implicits._
      val m = pcaModel(s, d)
      val (n, mean, evals, comps) = (m.n, m.mean, m.evals, m.comps)
      val dim = GramDim
      // driver-side exact checks on the decomposition
      var ortho = 0.0
      for (a <- 0 until PcaR; b <- 0 until PcaR) {
        var dot = 0.0
        var i = 0
        while (i < dim) { dot += comps(a)(i) * comps(b)(i); i += 1 }
        ortho = math.max(ortho, math.abs(dot - (if (a == b) 1.0 else 0.0)))
      }
      // residual check against the covariance the model CARRIES — no
      // second Gram aggregation (the model memoizes per corpus)
      var resid = 0.0
      for (r <- 0 until PcaR) {
        for (i <- 0 until dim) {
          var cv = 0.0
          var j = 0
          while (j < dim) { cv += m.cov(i)(j) * comps(r)(j); j += 1 }
          resid = math.max(resid,
            math.abs(cv - evals(r) * comps(r)(i)) / (1.0 + math.abs(evals(r))))
        }
      }
      // distributed variance of every projection in ONE aggregation
      // (2R sum columns), not R sequential jobs
      val proj = pcaProjection(s, d, mean, comps)
      val sums = proj.agg(
        sum(col("p0")).as("a0"),
        (1 until PcaR).map(r => sum(col(s"p$r")).as(s"a$r")) ++
          (0 until PcaR).map(r =>
            sum(col(s"p$r") * col(s"p$r")).as(s"b$r")): _*)
        .collect().head
      val varOk = (0 until PcaR).forall { r =>
        val s1 = sums.getAs[Double](s"a$r")
        val s2 = sums.getAs[Double](s"b$r")
        val vr = s2 / n - (s1 / n) * (s1 / n)
        math.abs(vr - evals(r)) <= 1e-3 * (1.0 + math.abs(evals(r)))
      }
      Seq((n, dim.toLong,
        if (ortho <= 1e-8) 1L else 0L,
        if (resid <= 1e-8) 1L else 0L,
        if (varOk) 1L else 0L))
        .toDF("n_vectors", "dim", "ortho_ok", "resid_ok", "var_ok")
    },
    Some(s"""SELECT CAST(count(*) AS BIGINT) AS n_vectors,
        CAST($GramDim AS BIGINT) AS dim,
        CAST(1 AS BIGINT) AS ortho_ok, CAST(1 AS BIGINT) AS resid_ok,
        CAST(1 AS BIGINT) AS var_ok
      FROM embeddings
      WHERE len(embedding) = $GramDim
        AND len(list_filter(embedding, x -> x IS NULL)) = 0"""),
    "PCA audit: orthonormality + eigen-residual (driver-exact) + " +
      "distributed variance-vs-eigenvalue flags; scalars oracle-recomputed")

  /** The unrounded projection columns (audit's variance input). */
  private def pcaProjection(s: SparkSession, d: String,
      mean: Array[Double], comps: Array[Array[Double]]): DataFrame = {
    import s.implicits._
    val x = Tables.embeddings(s, d)
      .filter($"embedding".isNotNull && size($"embedding") === GramDim &&
        !exists($"embedding", _.isNull))
    val cols = (0 until PcaR).map { r =>
      graft.functions.CenteredDot
        .centered_dot($"embedding", mean, comps(r)).as(s"p$r")
    }
    x.select(cols: _*)
  }

  // --------------------------------- int8 scalar quantization audit
  // Vector compression every 100 TB embedding store runs: symmetric
  // per-vector int8 quantization (q_i = round(127 · x_i / max|x|)) — 4×
  // smaller, dot products stay int arithmetic. Pure map stage; the audit
  // reports exact integer facts about each code vector (sum, extremes,
  // zero count), which both engines compute identically because the
  // pre-round arithmetic is the same IEEE-double expression tree and the
  // post-round values are exact integers.
  private val embedQuantize = QueryDef(
    "q_embed_quantize",
    (s, d) => {
      import s.implicits._
      // one-pass codegen kernel (functions/Int8QuantStats) — proven
      // bit-identical to the declarative transform/aggregate chain in
      // CustomFunctionsSpec, ~N interpreted lambda walks fewer per row
      val st = graft.functions.Int8QuantStats.int8_quant_stats($"embedding")
      Tables.embeddings(s, d)
        .select($"vec_id", st.as("s"))
        .select($"vec_id", $"s.sum_q", $"s.max_q", $"s.min_q", $"s.n_zero")
        .orderBy($"vec_id")
    },
    Some("""WITH t AS (
        SELECT vec_id,
          list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
        FROM embeddings),
      qv AS (
        SELECT e.vec_id,
          list_transform(e.embedding, x -> CASE WHEN t.maxabs = 0 THEN 0
            ELSE CAST(round(CAST(x AS DOUBLE) * 127.0 / t.maxabs) AS BIGINT) END) AS q
        FROM embeddings e JOIN t ON e.vec_id = t.vec_id)
      SELECT vec_id,
        CAST(list_sum(q) AS BIGINT) AS sum_q,
        CAST(list_max(q) AS BIGINT) AS max_q,
        CAST(list_min(q) AS BIGINT) AS min_q,
        CAST(len(list_filter(q, x -> x = 0)) AS BIGINT) AS n_zero
      FROM qv ORDER BY vec_id"""),
    "Symmetric int8 scalar quantization audit: exact integer code stats")

  // ------------------------------------------- metadata-filtered search
  /** The filter predicate of the declared filtered-search query. */
  private[graft] val FilterLang = "fr"

  // Filtered vector search — top-k under a metadata predicate, the
  // production retrieval shape ("nearest English docs", "nearest docs
  // from source X"). This is PRE-filtering: the candidate set is cut to
  // the predicate BEFORE any scoring (a broadcast id semi-join feeding
  // the scoring join), so top-k is exact over the filtered set — unlike
  // post-filtering an unfiltered ANN head, which silently loses recall
  // when the predicate is selective. The doc-id side of the semi-join is
  // metadata-only (the text column never loads: ReadSchema pruning).
  // The id set is NOT broadcast: a selective predicate would fit, but a
  // non-selective one ("lang <> 'xx'", a date range spanning the corpus)
  // is a corpus-scale relation and a forced broadcast aborts at the
  // 8 GiB limit (VERDICT r10 task 1). SHUFFLE_HASH-hinting the keep
  // side keeps it the build side per-partition — each task holds only
  // its vec_id slice, so the semi-join scales with the predicate's
  // selectivity instead of cliffing on it (the DedupOps verify-join
  // pattern). Only `queries` (bounded at NQ rows) is broadcast.
  private val simsearchFiltered = QueryDef(
    "q_simsearch_filtered",
    (s, d) => {
      import s.implicits._
      import graft.functions.ScaledDot.{decimal_scale6, scaled_dot}
      val emb = Tables.embeddings(s, d)
        .select($"vec_id", decimal_scale6($"embedding").as("sv"))
      val keep = Tables.documents(s, d)
        .filter($"lang" === FilterLang)
        .select($"doc_id".as("vec_id"))
      val queries = emb.filter($"vec_id" < NQ)
        .select($"vec_id".as("qid"), $"sv".as("qvec"))
      emb.join(keep.hint("shuffle_hash"), Seq("vec_id"), "left_semi")
        .select($"vec_id".as("cid"), $"sv".as("cvec"))
        .join(broadcast(queries))
        .filter($"qid" =!= $"cid")
        .select($"qid", $"cid", scaled_dot($"qvec", $"cvec").as("dot"))
        .groupBy($"qid")
        .agg(graft.functions.TopKPairs.top_k_pairs($"dot", $"cid", K).as("tk"))
        .select($"qid", posexplode($"tk"))
        .select($"qid", $"col.id".as("cid"),
          $"col.score".cast("double").as("dot"),
          ($"pos" + 1).cast("long").as("rank"))
        .orderBy($"qid", $"rank")
    },
    Some(s"""SELECT q.vec_id AS qid, c.vec_id AS cid,
      CAST(CAST(round(list_sum(list_transform(range(1, 65),
        i -> CAST(CAST(CAST(q.embedding[i] AS DOUBLE) AS DECIMAL(18,6))
           * CAST(CAST(c.embedding[i] AS DOUBLE) AS DECIMAL(18,6)) AS DECIMAL(20,12)))), 6)
        AS DECIMAL(38,6)) AS DOUBLE) AS dot,
      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        CAST(round(list_sum(list_transform(range(1, 65),
          i -> CAST(CAST(CAST(q.embedding[i] AS DOUBLE) AS DECIMAL(18,6))
             * CAST(CAST(c.embedding[i] AS DOUBLE) AS DECIMAL(18,6)) AS DECIMAL(20,12)))), 6)
          AS DECIMAL(38,6)) DESC, c.vec_id) AS rank
      FROM embeddings q
      JOIN embeddings c ON q.vec_id < $NQ AND q.vec_id <> c.vec_id
      JOIN documents dd ON c.vec_id = dd.doc_id AND dd.lang = '$FilterLang'
      QUALIFY rank <= $K
      ORDER BY qid, rank"""),
    s"Metadata-filtered exact top-k: lang='$FilterLang' candidates only, " +
      "pre-filter semi-join BEFORE scoring (no post-filter recall loss)")

  override def defs: Seq[QueryDef] =
    Seq(simsearchCosine, simsearchAnn, dedupEmbedding, simsearchIvf,
      simsearchIvfPq, embedNorm, embedQuantize, embedGram, embedPca,
      pcaAudit, simsearchFiltered)
}
