package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Algebraic invariants over generated inputs (SURVEY §5.2.3) — each
  * property runs the real operators on small random frames. ScalaCheck
  * generators are driven directly with fixed seeds (the scalatest-plus
  * bridge is not on the offline classpath), so every run is
  * deterministic.
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private val Runs = 10

  /** Deterministic samples from a generator. */
  private def samples[T](g: Gen[T]): Seq[T] =
    (1 to Runs).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private def forAll[A](g: Gen[A])(body: A => Unit): Unit =
    samples(g).foreach(body)

  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(body: (A, B) => Unit): Unit =
    samples(g1).zip(samples(g2)).foreach { case (a, b) => body(a, b) }

  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  private val rowsGen: Gen[List[(Long, Double)]] =
    Gen.listOfN(60, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0.0, 100.0)))

  test("property: dropDuplicates is idempotent") {
    forAll(rowsGen) { (rows: List[(Long, Double)]) =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("k", "v")
        val once = df.dropDuplicates("k")
        assert(once.dropDuplicates("k").count() === once.count())
        assert(once.count() === rows.map(_._1).distinct.size)
      }
    }
  }

  test("property: group avg lies within [min, max] of the group") {
    forAll(rowsGen) { (rows: List[(Long, Double)]) =>
      whenever(rows.nonEmpty) {
        val bad = rows.toDF("k", "v").groupBy($"k")
          .agg(avg($"v").as("a"), min($"v").as("mn"), max($"v").as("mx"))
          .filter($"a" < $"mn" - 1e-9 || $"a" > $"mx" + 1e-9)
        assert(bad.count() === 0)
      }
    }
  }

  test("property: union cardinality = sum; distinct union <= sum") {
    forAll(rowsGen, rowsGen) { (a: List[(Long, Double)], b: List[(Long, Double)]) =>
      val da = a.toDF("k", "v")
      val db = b.toDF("k", "v")
      assert(da.unionAll(db).count() === a.size + b.size)
      assert(da.union(db).distinct().count() <= a.size + b.size)
    }
  }

  test("property: salted aggregation equals direct aggregation") {
    forAll(rowsGen) { (rows: List[(Long, Double)]) =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("k", "v")
          .select($"k", $"v".cast("decimal(18,6)").as("v"))
        val direct = df.groupBy($"k")
          .agg(count("*").as("n"), sum($"v").cast("decimal(38,6)").as("s"))
          .as[(Long, Long, java.math.BigDecimal)].collect()
          .map(r => r._1 -> ((r._2, BigDecimal(r._3)))).toMap
        val salted = df.withColumn("salt", pmod(xxhash64($"v"), lit(8)))
          .groupBy($"k", $"salt")
          .agg(count("*").as("pn"), sum($"v").as("ps"))
          .groupBy($"k")
          .agg(sum($"pn").as("n"), sum($"ps").cast("decimal(38,6)").as("s"))
          .as[(Long, Long, java.math.BigDecimal)].collect()
          .map(r => r._1 -> ((r._2, BigDecimal(r._3)))).toMap
        assert(salted === direct)
      }
    }
  }

  test("property: simhash of a permuted bag is unchanged; ngrams ignore dup order") {
    import graft.functions.SimHash64.simhash64
    val tokensGen = Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d", "e"))
    forAll(tokensGen) { (toks: List[String]) =>
      whenever(toks.nonEmpty) {
        val perm = scala.util.Random.shuffle(toks)
        val h = Seq((toks, perm)).toDF("t1", "t2")
          .select(simhash64($"t1").as("h1"), simhash64($"t2").as("h2"))
          .as[(Long, Long)].head()
        assert(h._1 === h._2)
      }
    }
  }

  test("property: windowed sum of counts equals total count") {
    val tsGen = Gen.listOfN(50, Gen.choose(0L, 7200L))
    forAll(tsGen) { (offs: List[Long]) =>
      whenever(offs.nonEmpty) {
        val base = java.time.Instant.parse("2024-03-01T00:00:00Z").getEpochSecond
        val df = offs.map(o => new java.sql.Timestamp((base + o) * 1000L))
          .toDF("ts")
        val winSum = df.groupBy(window($"ts", "5 minutes")).count()
          .agg(sum($"count")).as[Long].head()
        assert(winSum === offs.size.toLong)
      }
    }
  }

  test("property: minhash signature of a superset is element-wise <=") {
    import graft.functions.MinHashSig.minhash_sig
    val wordsGen = Gen.listOfN(12, Gen.identifier.map(_.take(6)))
    forAll(wordsGen) { (words: List[String]) =>
      whenever(words.nonEmpty) {
        val sub = words.take(words.size / 2 + 1).distinct
        val sup = words.distinct
        val Seq(a, b) = Seq(sub, sup).toDF("sh")
          .select(minhash_sig($"sh", 8)).as[Seq[Long]].collect().toSeq
        a.zip(b).foreach { case (x, y) => assert(y <= x) }
      }
    }
  }

  test("property: moment-based variance matches two-pass definition") {
    val vGen = Gen.listOfN(30, Gen.choose(1, 5000)) // cents
    forAll(vGen) { (cents: List[Int]) =>
      whenever(cents.size >= 2) {
        val df = cents.map(c => BigDecimal(c) / 100).toDF("v")
          .select($"v".cast("decimal(18,2)").as("v"))
        val r = df.agg(count("*").as("n"),
            sum($"v").cast("decimal(38,2)").as("s1"),
            sum(($"v" * $"v").cast("decimal(18,4)")).cast("decimal(38,4)").as("s2"))
          .select((($"s2" * $"n" - $"s1" * $"s1") /
            ($"n".cast("decimal(20,0)") * ($"n" - 1)))
            .cast("decimal(38,6)").cast("double"))
          .as[Double].head()
        val xs = cents.map(_ / 100.0)
        val m = xs.sum / xs.size
        val expect = xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
        assert(math.abs(r - expect) < 1e-6,
          s"moment variance $r vs two-pass $expect")
      }
    }
  }

  test("property: token-id sequences conserve token counts") {
    // every token gets exactly one id (vocab or OOV); ids_str length
    // reconstructs n_tokens
    val q = SparkEntry.queries("q_text_token_ids")(spark, sf)
    val bad = q.filter(
      size(split($"ids_str", ",")) =!= $"n_tokens" || $"n_oov" > $"n_tokens")
    assert(bad.count() === 0)
  }

  test("property: banded SRP bucket sizes bound the near-dup pair work") {
    import graft.operators.SimilarityOps
    import graft.functions.SrpSig
    // on corpus prefixes of varying size: per band, bucket populations
    // sum to n, and candidate-pair work Σ c·(c−1)/2 stays a tiny fraction
    // of the n·(n−1)/2 all-pairs work the banding exists to avoid
    forAll(Gen.choose(100, 500)) { (n: Int) =>
      val vecs = Tables.embeddings(spark, sf)
        .filter($"vec_id" < n).select($"vec_id", $"embedding")
      val buckets = vecs.select(posexplode(SrpSig.srp_sig($"embedding",
          SimilarityOps.DedupBands, SimilarityOps.DedupBits,
          SimilarityOps.SrpSeed)).as(Seq("band", "sig")))
        .groupBy($"band", $"sig").count()
        .groupBy($"band").agg(
          sum($"count").as("n_vecs"),
          sum($"count" * ($"count" - 1) / 2).cast("long").as("pair_work"))
        .as[(Int, Long, Long)].collect()
      assert(buckets.length === SimilarityOps.DedupBands)
      val allPairs = n.toLong * (n - 1) / 2
      buckets.foreach { case (band, nv, work) =>
        assert(nv === n.toLong, s"band $band partitions the corpus")
        assert(work <= allPairs / 20,
          s"band $band pair work $work must be ≪ all-pairs $allPairs")
      }
    }
  }

  test("property: gram_agg + sum_vector equal a local fold on random corpora") {
    val dim = 8
    val vecGen = Gen.listOfN(20,
      Gen.listOfN(dim, Gen.choose(-1000000L, 1000000L)))
    forAll(vecGen) { (vecs: List[List[Long]]) =>
      val df = vecs.map(v => Tuple1(v)).toDF("sa")
      val got = df.agg(
        graft.functions.GramAggregate.gram_agg($"sa", dim).as("g"),
        graft.functions.SumVector.sum_vector($"sa", dim).as("m"))
        .as[((Long, Seq[Long]), Seq[Long])].collect().head
      val ((n, cells), m1) = got
      assert(n === vecs.length.toLong)
      val wantM = (0 until dim).map(i => vecs.map(_(i)).sum)
      assert(m1.toSeq === wantM)
      var p = 0
      for (i <- 0 until dim; j <- i until dim) {
        val want = vecs.map(v => v(i) * v(j)).sum
        assert(cells(p) === want, s"cell ($i,$j)")
        p += 1
      }
    }
  }

  test("property: pagerank on random graphs — exact replay, mass " +
      "conservation, positivity") {
    import java.math.{BigDecimal => JBD, RoundingMode => RM}
    val edgeGen: Gen[List[(Long, Long)]] =
      Gen.listOfN(40, Gen.zip(Gen.choose(0L, 14L), Gen.choose(0L, 14L)))
    forAll(edgeGen) { (raw: List[(Long, Long)]) =>
      // canonicalize to the op's precondition: distinct a < b
      val pairs = raw.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b)) }.distinct
      whenever(pairs.nonEmpty) {
        val got = operators.GraphOps
          .pagerankMil(spark, pairs.toDF("a", "b"), 4)
          .as[(Long, Long, Long)].collect()
          .map { case (n, dg, p) => n -> ((dg, p)) }.toMap
        // independent local replay (the IterativeOpsSpec arithmetic)
        val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
        val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
        val n = deg.size.toLong
        def div0(num: JBD, den: Long): Long =
          num.setScale(12, RM.HALF_UP).divide(new JBD(den), 12, RM.HALF_UP)
            .setScale(0, RM.HALF_UP).longValueExact()
        def rat(num: Long): Long = new JBD(num).setScale(2)
          .divide(new JBD(n), 0, RM.HALF_UP).longValueExact()
        var pr = deg.keys.map(_ -> rat(1000000L)).toMap
        for (_ <- 1 to 4) {
          val s = edges.groupBy(_._2).map { case (v, es) =>
            v -> es.map { case (u, _) => div0(new JBD(pr(u)), deg(u)) }.sum }
          pr = s.map { case (v, sv) =>
            v -> (rat(150000L) + div0(new JBD(85L * sv), 100L)) }
        }
        assert(got.map { case (k, (_, p)) => k -> p } === pr)
        assert(got.values.forall(_._2 > 0L), "ranks positive")
        val mass = got.values.map(_._2).sum
        assert(math.abs(mass - 1000000L) <= 4L * got.size,
          s"mass drifted: $mass over ${got.size} nodes")
      }
    }
  }

  test("property: RRF fusion respects rank domination on random rankings") {
    // a doc ranked at least as well in BOTH systems (and strictly better
    // in one) must fuse strictly higher — monotonicity of Σ 1/(k + r)
    def mil(den: Long): Long =
      (BigDecimal(1).setScale(2) / den)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .*(1000000L).toLongExact
    def rrf(l: Long, d: Long): Long =
      (if (l > 0) mil(60L + l) else 0L) + (if (d > 0) mil(60L + d) else 0L)
    val rankGen = Gen.listOfN(30,
      Gen.zip(Gen.choose(0L, 20L), Gen.choose(0L, 20L)))
    forAll(rankGen) { (rows: List[(Long, Long)]) =>
      for {
        (l1, d1) <- rows
        (l2, d2) <- rows
        // dominance only comparable when presence matches per system
        if (l1 > 0) == (l2 > 0) && (d1 > 0) == (d2 > 0)
        if (l1 > 0 && l1 <= l2 || l1 == 0) && (d1 > 0 && d1 <= d2 || d1 == 0)
        if l1 < l2 || d1 < d2
      } assert(rrf(l1, d1) > rrf(l2, d2),
        s"($l1,$d1) must outrank ($l2,$d2)")
    }
  }

  test("property: centered_dot equals the local centered projection loop") {
    val dim = 8
    val g = Gen.zip(
      Gen.listOfN(dim, Gen.choose(-1.0, 1.0)),
      Gen.listOfN(dim, Gen.choose(-1.0, 1.0)),
      Gen.listOfN(10, Gen.listOfN(dim, Gen.choose(-1.0f, 1.0f))))
    forAll(g) { case (mean, comp, vecs) =>
      val m = mean.toArray; val c = comp.toArray
      val df = vecs.map(v => Tuple1(v)).toDF("v")
      val got = df.select(
        graft.functions.CenteredDot.centered_dot($"v", m, c).as("p"))
        .as[Double].collect()
      got.zip(vecs).foreach { case (gv, v) =>
        var acc = 0.0
        var i = 0
        while (i < dim) { acc += (v(i).toDouble - m(i)) * c(i); i += 1 }
        assert(gv === acc) // bit-identical: same loop order, IEEE ops
      }
    }
  }
}
