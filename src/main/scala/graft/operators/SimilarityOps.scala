package graft.operators

import graft.{QueryDef, QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  private val K = 5
  private val NQ = 10 // query vectors: vec_id < NQ

  /** Exact decimal dot product — custom expression (one tight loop per
    * row; the equivalent zip_with/aggregate chain evaluates interpreted
    * and was ~5× slower scoring |queries| × |corpus| pairs). */
  private def dotDec(a: Column, b: Column): Column =
    graft.functions.DecimalDot.decimal_dot(a, b)

  // --------------------------------------------- exact brute-force top-k
  private val simsearchCosine = QueryDef(
    "q_simsearch_cosine",
    (s, d) => {
      import s.implicits._
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter($"vec_id" < NQ)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val scored = emb.select($"vec_id".as("cid"), $"embedding".as("cvec"))
        .join(broadcast(queries))
        .filter($"qid" =!= $"cid")
        .select($"qid", $"cid", dotDec($"qvec", $"cvec").as("dot"))
      // two-phase top-k: local heads per input partition, then global
      val localW = Window.partitionBy($"qid", $"pid")
        .orderBy($"dot".desc, $"cid")
      val globalW = Window.partitionBy($"qid").orderBy($"dot".desc, $"cid")
      scored
        .withColumn("pid", spark_partition_id())
        .withColumn("lrn", row_number().over(localW))
        .filter($"lrn" <= K).drop("pid", "lrn")
        .withColumn("rank", row_number().over(globalW).cast("long"))
        .filter($"rank" <= K)
        .orderBy($"qid", $"rank")
        // ranking decided on the exact decimal dot; ship as double
        .withColumn("dot", $"dot".cast("double"))
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
      FROM embeddings q JOIN embeddings c ON q.vec_id < $NQ AND q.vec_id <> c.vec_id
      QUALIFY rank <= $K
      ORDER BY qid, rank"""),
    "Exact top-k neighbor search: broadcast queries, decimal dot, 2-phase top-k")

  // ------------------------------------------------------ SRP-LSH ANN
  /** 8 fixed pseudorandom hyperplanes (deterministic seed). */
  private val planes: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(20240101L)
    Seq.fill(8)(Seq.fill(64)(rnd.nextGaussian()))
  }

  /** 8-bit SRP signature: bit k set iff dot(v, plane_k) > 0. */
  private def srpSig(v: Column): Column =
    planes.zipWithIndex.map { case (p, k) =>
      val dot = aggregate(
        zip_with(v, typedlit(p), (x, y) => x.cast("double") * y),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, lit(1 << k)).otherwise(lit(0))
    }.reduce(_ + _)

  private def cosDouble(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private val simsearchAnn = QueryDef(
    "q_simsearch_ann_srp",
    (s, d) => {
      import s.implicits._
      val sigs = Tables.embeddings(s, d)
        .select($"vec_id", $"embedding", srpSig($"embedding").as("sig"))
      val queries = sigs.filter($"vec_id" < NQ)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"), $"sig".as("qsig"))
      val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"cid")
      broadcast(queries)
        .join(sigs.select($"vec_id".as("cid"), $"embedding".as("cvec"), $"sig"),
          $"qsig" === $"sig" && $"qid" =!= $"cid", "left")
        .select($"qid", $"qsig", $"cid",
          round(cosDouble($"qvec", $"cvec"), 6).as("cos"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter($"rank" <= K)
        .orderBy($"qid", $"rank")
    },
    None,
    "ANN via 8-bit SRP-LSH bucket probe + exact rerank (left join keeps " +
      "queries with empty buckets)")

  // ------------------------------------------- embedding near-dup audit
  // SRP buckets over the WHOLE corpus; within-bucket pairs checked for
  // cosine >= 0.9 (double — threshold far from any fixture value, so the
  // comparison is stable). Output is the per-bucket audit: how many
  // vectors, pairs checked, near-dups found. All-pairs work is bounded by
  // Σ bucket² ≈ N²/2^bits — the knob that keeps this linear-ish at scale.
  private val dedupEmbedding = QueryDef(
    "q_dedup_embedding",
    (s, d) => {
      import s.implicits._
      val sigs = Tables.embeddings(s, d)
        .select($"vec_id", $"embedding", srpSig($"embedding").as("sig"))
      val pairs = sigs.as("a")
        .join(sigs.as("b"),
          col("a.sig") === col("b.sig") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.sig").as("sig"),
          cosDouble(col("a.embedding"), col("b.embedding")).as("cos"))
      val pairAgg = pairs.groupBy($"sig")
        .agg(count("*").as("n_pairs"),
          sum(when($"cos" >= 0.9, 1L).otherwise(0L)).as("n_neardups"))
      sigs.groupBy($"sig").agg(count("*").as("n_vecs"))
        .join(pairAgg, Seq("sig"), "left")
        .select($"sig", $"n_vecs",
          coalesce($"n_pairs", lit(0L)).as("n_pairs"),
          coalesce($"n_neardups", lit(0L)).as("n_neardups"))
        .orderBy($"sig")
    },
    None,
    "Embedding-cosine near-dup audit via SRP-LSH buckets")

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

  private[graft] def nearestCentroid(
      cents: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < cents.length) {
      var d = 0.0; var i = 0
      val cent = cents(c)
      while (i < v.length) { val t = v(i) - cent(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private[graft] def probeLists(
      cents: Array[Array[Double]], v: Array[Double], nprobe: Int): Seq[Int] = {
    cents.indices.map { c =>
      var d = 0.0; var i = 0
      while (i < v.length) { val t = v(i) - cents(c)(i); d += t * t; i += 1 }
      (d, c)
    }.sortBy(x => (x._1, x._2)).take(nprobe).map(_._2)
  }

  /** IVF index parameters: 16 lists, probe 2, train on a BOUNDED sample. */
  private val IvfK = 16
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

  private val simsearchIvf = QueryDef(
    "q_simsearch_ivf",
    (s, d) => {
      import s.implicits._
      val emb = Tables.embeddings(s, d)
        .select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      val cents = kmeansFit(ivfTrainingSample(s, d), IvfK, IvfIters)
      // distributed assignment: tight JVM loop per row, quantizer shipped
      // in the closure (k*dim doubles — kilobytes)
      val assigned = emb.map { case (id, v) =>
        (id, v, nearestCentroid(cents, v.map(_.toDouble).toArray))
      }.toDF("cid", "cvec", "list")
      // one row per (query, probed list): the probe becomes an EQUI join
      // key — a broadcast hash join on `list`, not a nested-loop scan of
      // every query per candidate (matters once |queries| grows)
      val queries = emb.filter(_._1 < NQ).collect().toSeq.flatMap {
        case (id, v) =>
          probeLists(cents, v.map(_.toDouble).toArray, IvfNProbe)
            .map(p => (id, v, p))
      }.toDF("qid", "qvec", "list")
      val w = Window.partitionBy($"qid").orderBy($"dot".desc, $"cid")
      broadcast(queries)
        .join(assigned, Seq("list"))
        .filter($"qid" =!= $"cid")
        .select($"qid", $"cid", $"list",
          graft.functions.DecimalDot.decimal_dot($"qvec", $"cvec").as("dot"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter($"rank" <= K)
        .orderBy($"qid", $"rank")
        .withColumn("dot", $"dot".cast("double"))
    },
    None,
    "IVF ANN: deterministic k-means coarse quantizer (16 lists), " +
      "nprobe=2 probe, exact decimal rerank")

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

  override def defs: Seq[QueryDef] =
    Seq(simsearchCosine, simsearchAnn, dedupEmbedding, simsearchIvf,
      embedNorm)
}
