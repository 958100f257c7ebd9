package graft

import graft.functions.SimHash64.simhash64
import graft.functions.WordNGrams.word_ngrams
import graft.functions.DecimalDot.decimal_dot
import org.apache.spark.sql.functions._

/** Custom Catalyst expressions: Column API + SQL registration surface. */
class CustomFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("sorted_intersect_size equals size(array_intersect) on sorted distinct arrays") {
    import graft.functions.SortedIntersectSize.sorted_intersect_size
    // randomized parity over the kernel's whole contract surface:
    // empty/disjoint/identical/overlapping arrays, plus a trailing null
    // (array_sort puts nulls last; null matches only null)
    val rng = new scala.util.Random(7)
    val cases = (1 to 200).map { i =>
      def arr() = {
        val base = Seq.fill(rng.nextInt(12))(s"t${rng.nextInt(10)}").distinct
        if (i % 17 == 0) base :+ null else base
      }
      (arr(), arr())
    } :+ ((Seq.empty[String], Seq("a"))) :+ ((Seq("a", null), Seq("b", null)))
    val df = cases.toDF("a", "b")
      .select(array_sort($"a").as("a"), array_sort($"b").as("b"))
      .select(
        sorted_intersect_size($"a", $"b").as("fast"),
        size(array_intersect($"a", $"b")).as("ref"))
    assert(df.filter($"fast" =!= $"ref").count() == 0)
    // null input → null out (BinaryExpression null-safety)
    val n = Seq((Seq("a"), null: Seq[String])).toDF("a", "b")
      .select(sorted_intersect_size($"a", $"b")).collect()
    assert(n.head.isNullAt(0))
  }

  test("word_ngrams equals the declarative HOF formulation") {
    val df = Tables.documents(spark, sf).limit(50)
      .select(split(lower($"text"), " +").as("t"))
    val got = df.select(word_ngrams($"t", 3).as("sh"))
      .as[Seq[String]].collect().map(_.toSet)
    val ref = df.select(
      when(size($"t") >= 3,
        array_distinct(transform(sequence(lit(1), size($"t") - 2),
          i => concat_ws(" ", element_at($"t", i), element_at($"t", i + 1),
            element_at($"t", i + 2)))))
        .otherwise(array().cast("array<string>")).as("sh"))
      .as[Seq[String]].collect().map(_.toSet)
    got.zip(ref).foreach { case (g, r) => assert(g === r) }
  }

  test("quality_model_score equals the declarative hashed-ngram chain") {
    // full corpus + hand-planted edges (empty, single word, whitespace,
    // repeated tokens); the kernel and the interpreted HOF chain must be
    // bit-identical on (n_grams, raw)
    val docs = Tables.documents(spark, sf).select($"text")
      .unionByName(Seq("", "one", "  ", "a a a", "x y x y")
        .toDF("text"))
    val (kn, kraw) = operators.TextOps.modelRawScore($"text")
    val (dn, draw) = operators.TextOps.modelRawScoreDeclarative($"text")
    val rows = docs.select(kn.as("kn"), kraw.as("kraw"),
        dn.as("dn"), draw.as("draw"))
      .as[(Long, Long, Long, Long)].collect()
    rows.foreach { case (a, b, c, d) =>
      assert(a === c, "n_grams")
      assert(b === d, "raw score")
    }
  }

  test("word_ngrams edge cases: short arrays, n=1") {
    val df = Seq(Seq("a"), Seq("a", "b"), Seq("a", "b", "c")).toDF("t")
    val r = df.select(word_ngrams($"t", 3).as("s")).as[Seq[String]].collect()
    assert(r(0) === Seq.empty)
    assert(r(1) === Seq.empty)
    assert(r(2) === Seq("a b c"))
    val u = df.select(word_ngrams($"t", 1).as("s")).as[Seq[String]].collect()
    assert(u(2) === Seq("a", "b", "c"))
  }

  test("simhash64 is deterministic and order-invariant on multisets") {
    val df = Seq(
      (1L, Seq("x", "y", "z")),
      (2L, Seq("z", "y", "x")), // same multiset, different order
      (3L, Seq("x", "y", "q"))).toDF("id", "t")
    val h = df.select($"id", simhash64($"t").as("h"))
      .as[(Long, Long)].collect().toMap
    assert(h(1L) === h(2L), "simhash over a bag ignores order")
    assert(h(1L) !== h(3L), "different bags should differ")
  }

  test("decimal_dot equals the declarative decimal chain") {
    val df = Tables.embeddings(spark, sf).limit(100)
      .select($"embedding".as("a"), $"embedding".as("b"))
    def dec6(c: org.apache.spark.sql.Column) =
      c.cast("double").cast("decimal(18,6)")
    val ref = df.select(round(
      aggregate(zip_with($"a", $"b", (x, y) => (dec6(x) * dec6(y)).cast("decimal(20,12)")),
        lit(0).cast("decimal(28,12)"), (acc, x) => (acc + x).cast("decimal(28,12)")),
      6).cast("decimal(38,6)").cast("string")).as[String].collect()
    val got = df.select(decimal_dot($"a", $"b").cast("string")).as[String].collect()
    got.zip(ref).foreach { case (g, r) => assert(BigDecimal(g) === BigDecimal(r)) }
  }

  test("scaled_dot over decimal_scale6 is bit-identical to decimal_dot") {
    import graft.functions.ScaledDot.{decimal_scale6, scaled_dot}
    // fixture vectors (cross pairs) ...
    val e = Tables.embeddings(spark, sf).limit(40)
      .select($"vec_id", $"embedding",
        decimal_scale6($"embedding").as("sv"))
    val pairs = e.toDF("ia", "va", "sa")
      .crossJoin(e.toDF("ib", "vb", "sb")).limit(800)
    val both = pairs.select(
      decimal_dot($"va", $"vb").cast("string").as("fused"),
      scaled_dot($"sa", $"sb").cast("string").as("factored"))
      .as[(String, String)].collect()
    both.foreach { case (f, s) => assert(BigDecimal(f) === BigDecimal(s)) }

    // ... plus null elements and mismatched lengths (DecimalDot's skip /
    // min-length rules must survive the factoring)
    val df = Seq(
      (Seq[java.lang.Float](1.5f, null, 2.25f), Seq[java.lang.Float](2.0f, 3.0f, null)),
      (Seq[java.lang.Float](0.125f, -7.5f), Seq[java.lang.Float](4.0f)),
      (Seq[java.lang.Float](), Seq[java.lang.Float](1.0f))).toDF("a", "b")
    val nb = df.select(
      decimal_dot($"a", $"b").cast("string").as("fused"),
      scaled_dot(decimal_scale6($"a"), decimal_scale6($"b")).cast("string").as("factored"))
      .as[(String, String)].collect()
    nb.foreach { case (f, s) => assert(BigDecimal(f) === BigDecimal(s)) }
  }

  test("scaled_dot skips genuinely-null long elements (SQL-path arrays)") {
    // scaled_dot is SQL-registered and accepts any array<long>, including
    // arrays NOT produced by decimal_scale6 whose elements can be null;
    // a null must follow DecimalDot's skip rule, not unbox to 0 (which
    // would be indistinguishable from a real zero term). Scale-6 longs:
    // 2_000_000 = 2.0; pair (2.0 * 3.0) skipped by the null leaves 1.0*1.0.
    val got = spark.sql(
      """SELECT CAST(scaled_dot(array(CAST(2000000 AS LONG), CAST(1000000 AS LONG)),
        |                        array(NULL, CAST(1000000 AS LONG))) AS STRING)""".stripMargin)
      .as[String].head()
    assert(BigDecimal(got) === BigDecimal("1.000000"))
  }

  test("ordered_pairs emits exactly the i<j pairs of a sorted posting list") {
    import graft.functions.OrderedPairs.ordered_pairs
    val df = Seq(
      Seq((1L, 10L), (3L, 30L), (7L, 70L)),
      Seq((5L, 50L)), // single element: no pairs
      Seq.empty[(Long, Long)]).toDF("docs")
    val got = df.select(ordered_pairs($"docs").as(Seq("id1", "n1", "id2", "n2")))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 10L, 3L, 30L), (1L, 10L, 7L, 70L), (3L, 30L, 7L, 70L)))
    // pair count for n elements is n*(n-1)/2 — the Σ df² contract
    val n = 40
    val big = Seq((0 until n).map(i => (i.toLong, i.toLong))).toDF("docs")
    assert(big.select(ordered_pairs($"docs")).count() === n * (n - 1) / 2)
  }

  test("blocked pair kernel reproduces the ordered_pairs multiset at every cap") {
    import graft.functions.OrderedPairs.ordered_pairs
    // random posting lists with duplicate dn entries (the winnow
    // multiplicity case) — the blocked kernel must emit EXACTLY the same
    // i<j pair multiset as the single-list generator for caps that
    // divide, straddle, and exceed the list length
    val rnd = new scala.util.Random(7)
    val lists = Seq.tabulate(20) { _ =>
      val n = 1 + rnd.nextInt(40)
      Seq.fill(n)((rnd.nextInt(8).toLong, rnd.nextInt(5).toLong)).sorted
    }
    val df = lists.zipWithIndex.map { case (l, i) => (i.toLong, l) }
      .toDF("key", "docs")
    val expected = df
      .select(ordered_pairs($"docs").as(Seq("id1", "n1", "id2", "n2")))
      .as[(Long, Long, Long, Long)].collect().toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    for (cap <- Seq(2, 3, 7, 64)) {
      val posting = df.select($"key", explode($"docs").as("dn"))
      val got = operators.PairStreams
        .blockedPairs(posting, Seq($"key"), $"dn", Seq("id1", "n1", "id2", "n2"), cap)
        .as[(Long, Long, Long, Long)].collect().toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(got === expected, s"pair multiset diverged at cap=$cap")
    }
  }

  test("block_split covers every block pair exactly once; block_pairs streams them") {
    import graft.functions.BlockedPairs._
    // 10 elements, cap 4 -> blocks [0..3][4..7][8..9]: 3 intra + 3 cross
    val df = Seq(Seq.tabulate(10)(i => (i.toLong, (i * 10).toLong))).toDF("docs")
    val buckets = df
      .select(block_split($"docs", 4).as(Seq("b1", "b2", "l_id", "l_n", "r_id", "r_n")))
    val rows = buckets.collect()
    assert(rows.length === 6)
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).toSet ===
      Set((0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2)))
    // every cross row is ordered: max(left ids) < min(right ids)
    rows.filter(r => r.getInt(0) != r.getInt(1)).foreach { r =>
      assert(r.getSeq[Long](2).max < r.getSeq[Long](4).min)
    }
    val pairs = buckets
      .select(block_pairs($"l_id", $"l_n", $"r_id", $"r_n").as(Seq("id1", "n1", "id2", "n2")))
      .as[(Long, Long, Long, Long)].collect()
    assert(pairs.length === 45) // 10*9/2
    assert(pairs.map(p => (p._1, p._3)).toSet ===
      (for (i <- 0 until 10; j <- i + 1 until 10) yield (i.toLong, j.toLong)).toSet)
    assert(pairs.forall(p => p._2 === p._1 * 10 && p._4 === p._3 * 10))
  }

  test("rolling_winnow matches an independent JVM recomputation") {
    import graft.functions.RollingWinnow.rolling_winnow
    // independent reference implementation: brute-force k-gram hashes +
    // naive per-window minimum with rightmost-min tie-break
    def ref(s: String, k: Int, w: Int): Seq[Long] = {
      val b = s.getBytes("UTF-8")
      val n = b.length - k + 1
      if (n <= 0) return Seq.empty
      val hs = (0 until n).map { i =>
        var h = 0L
        (i until i + k).foreach(j => h = h * 257L + (b(j) & 0xff))
        h
      }
      val sel = scala.collection.mutable.TreeSet[Long]()
      if (n < w) sel += hs.min
      else (0 to n - w).foreach { s0 =>
        val win = hs.slice(s0, s0 + w)
        val m = win.min
        sel += m
      }
      sel.toSeq
    }
    val texts = Tables.documents(spark, sf).limit(30)
      .select($"doc_id", lower($"text")).as[(Long, String)].collect()
    val got = texts.map(_._1).zip(
      texts.map(t => Seq(t._2).toDF("t")
        .select(rolling_winnow($"t", 12, 6)).as[Seq[Long]].head())).toMap
    texts.foreach { case (id, txt) =>
      assert(got(id) === ref(txt, 12, 6), s"doc $id")
    }
  }

  test("winnow fingerprints: near-identical docs share most fingerprints") {
    val pairs = q("q_text_fingerprint_winnow")
    import org.apache.spark.sql.functions.col
    val found = pairs.select(col("doc1"), col("doc2"))
      .as[(Long, Long)].collect().toSet
    val exact = q("q_dedup_ngram_jaccard").select(col("doc1"), col("doc2"))
      .as[(Long, Long)].collect().toSet
    val recall = exact.count(found.contains).toDouble / exact.size
    assert(recall >= 0.8, s"winnow should catch the planted near-dups: $recall")
  }

  test("minhash_sig equals per-seed min of XXH64 over the set") {
    import graft.functions.MinHashSig.minhash_sig
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.types.UTF8String
    val sets = Seq(Seq("a", "bb", "ccc"), Seq("spark", "scan"))
    val got = sets.toDF("sh")
      .select(minhash_sig($"sh", 4)).as[Seq[Long]].collect()
    val expect = sets.map { set =>
      (0 until 4).map { k =>
        set.map { s =>
          val u = UTF8String.fromString(s)
          XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, k.toLong)
        }.min
      }
    }
    got.zip(expect).foreach { case (g, e) => assert(g === e) }
    // signature of a superset is element-wise <= (min can only decrease)
    val sup = Seq(Seq("a", "bb", "ccc", "dddd")).toDF("sh")
      .select(minhash_sig($"sh", 4)).as[Seq[Long]].head()
    got.head.zip(sup).foreach { case (sub, s) => assert(s <= sub) }
  }

  test("srp_sig equals the declarative HOF formulation (single and multi band)") {
    import graft.functions.SrpSig
    val df = Tables.embeddings(spark, sf).limit(100).select($"embedding")
    for ((bands, bits) <- Seq((1, 8), (4, 16))) {
      val planes = SrpSig.planes(20240101L, bands * bits, 64)
      // the interpreted formulation the kernel replaced: one
      // zip_with/aggregate dot per plane, sign bit packed per band
      val ref = df.select((0 until bands).map { b =>
        (0 until bits).map { j =>
          val p = planes(b * bits + j).toSeq
          val dot = aggregate(
            zip_with($"embedding", typedlit(p), (x, y) => x.cast("double") * y),
            lit(0.0), (acc, x) => acc + x)
          when(dot > 0, lit(1L << j)).otherwise(lit(0L))
        }.reduce(_ + _).as(s"b$b")
      }: _*).collect().map(r => (0 until bands).map(r.getLong))
      val got = df.select(SrpSig.srp_sig($"embedding", bands, bits, 20240101L))
        .as[Seq[Long]].collect()
      got.zip(ref).foreach { case (g, r) => assert(g === r, s"bands=$bands bits=$bits") }
    }
  }

  test("double_dot equals the declarative double chain") {
    import graft.functions.DoubleDot.double_dot
    val df = Tables.embeddings(spark, sf).limit(100)
      .select($"embedding".as("a"), $"embedding".as("b"))
    val ref = df.select(
      aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)).as[Double].collect()
    val got = df.select(double_dot($"a", $"b")).as[Double].collect()
    got.zip(ref).foreach { case (g, r) => assert(g === r) } // bit-identical
  }

  test("int8_quant_stats equals the declarative quantization chain") {
    import graft.functions.Int8QuantStats.int8_quant_stats
    val df = Tables.embeddings(spark, sf)
    val maxabs = array_max(transform($"embedding", x => abs(x.cast("double"))))
    val q = transform($"embedding",
      x => when(lit(0.0) === maxabs, lit(0L))
        .otherwise(round(x.cast("double") * 127.0 / maxabs).cast("long")))
    val ref = df.select($"vec_id", q.as("q"))
      .select($"vec_id",
        aggregate($"q", lit(0L), (a, x) => a + x).as("sum_q"),
        array_max($"q").as("max_q"), array_min($"q").as("min_q"),
        size(filter($"q", x => x === 0L)).cast("long").as("n_zero"))
      .orderBy($"vec_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    val got = df.select($"vec_id", int8_quant_stats($"embedding").as("s"))
      .select($"vec_id", $"s.sum_q", $"s.max_q", $"s.min_q", $"s.n_zero")
      .orderBy($"vec_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq === ref.toSeq)
  }

  test("double_dot null semantics match the declarative chain") {
    import graft.functions.DoubleDot.double_dot
    val df = Seq(
      (1L, Seq[java.lang.Float](1f, 2f), Seq[java.lang.Float](3f, 4f)),
      (2L, Seq[java.lang.Float](1f, null), Seq[java.lang.Float](3f, 4f)),
      (3L, Seq[java.lang.Float](1f), Seq[java.lang.Float](3f, 4f)))
      .toDF("id", "a", "b")
    val ref = df.select($"id",
      aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("d"))
      .orderBy($"id").collect().map(r => Option(r.getAs[java.lang.Double]("d")))
    val got = df.select($"id", double_dot($"a", $"b").as("d"))
      .orderBy($"id").collect().map(r => Option(r.getAs[java.lang.Double]("d")))
    assert(got.toSeq === ref.toSeq)
    assert(got(1).isEmpty && got(2).isEmpty) // null element / length mismatch
  }

  test("int8_quant_stats: empty and all-null vectors yield NULL stats, n_zero=0") {
    import graft.functions.Int8QuantStats.int8_quant_stats
    val df = Seq(
      (1L, Seq[java.lang.Float]()),
      (2L, Seq[java.lang.Float](null, null)),
      (3L, Seq[java.lang.Float](1f, -2f)))
      .toDF("vec_id", "embedding")
    val r = df.select($"vec_id", int8_quant_stats($"embedding").as("s"))
      .select($"vec_id", $"s.sum_q", $"s.max_q", $"s.min_q", $"s.n_zero")
      .orderBy($"vec_id").collect()
    for (i <- 0 to 1) { // list_sum/list_max/list_min-of-nothing semantics
      assert(r(i).isNullAt(1) && r(i).isNullAt(2) && r(i).isNullAt(3))
      assert(r(i).getAs[Long]("n_zero") === 0L)
    }
    assert(r(2).getAs[Long]("max_q") === 64L) // round(1*127/2)
    assert(r(2).getAs[Long]("min_q") === -127L)
  }

  test("nearest_centroid kernel matches the driver-side trainer assignment") {
    import graft.functions.NearestCentroid.nearest_centroid
    val cents = operators.SimilarityOps.kmeansFit(
      operators.SimilarityOps.ivfTrainingSample(spark, sf), 16, 5)
    val got = Tables.embeddings(spark, sf)
      .select($"vec_id", nearest_centroid($"embedding", cents).as("list"))
      .orderBy($"vec_id").as[(Long, Int)].collect()
    val ref = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().sortBy(_._1)
      .map { case (id, v) =>
        (id, operators.SimilarityOps.nearestCentroid(cents, v.map(_.toDouble).toArray))
      }
    assert(got.toSeq === ref.toSeq)
  }

  test("custom functions resolve in SQL via extensions/registration") {
    Tables.documents(spark, sf).limit(5).createOrReplaceTempView("docs_tmp")
    val r = spark.sql(
      """SELECT doc_id, simhash64(split(lower(text), ' +')) AS h,
         size(word_ngrams(split(lower(text), ' +'), 3)) AS n,
         size(minhash_sig(word_ngrams(split(lower(text), ' +'), 3), 16)) AS m
         FROM docs_tmp ORDER BY doc_id""").collect()
    assert(r.length === 5)
    assert(r.forall(_.getAs[Int]("n") >= 0))
    assert(r.forall(_.getAs[Int]("m") === 16))
    Tables.embeddings(spark, sf).limit(5).createOrReplaceTempView("emb_tmp")
    val e = spark.sql(
      """SELECT size(srp_sig(embedding, 8, 16, 20240101)) AS nb,
         double_dot(embedding, embedding) AS n2
         FROM emb_tmp""").collect()
    assert(e.forall(_.getAs[Int]("nb") === 8))
    assert(e.forall(r => math.abs(r.getAs[Double]("n2") - 1.0) < 1e-3))
  }

  test("gram_agg equals the declarative double-explode Gram and a local fold") {
    import graft.operators.SimilarityOps
    // declared-query output (the kernel path)
    val got = q("q_embed_gram").as[(Long, Long, Long, Long)].collect()
    // declarative twin: identical rows, bit for bit
    val ref = SimilarityOps.gramDeclarative(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.toSeq === ref.toSeq, "kernel vs declarative Gram")
    // and a third way: local fold over the collected corpus
    val vecs = Tables.embeddings(spark, sf)
      .select($"embedding").as[Seq[Float]].collect()
      .filter(v => v.length == 64 && !v.contains(null))
      .map(graft.functions.ScaledDot.scale6)
    val cells = scala.collection.mutable.Map[(Long, Long), Long]()
    vecs.foreach { x =>
      for (i <- 0 until 64; j <- i until 64)
        cells((i + 1L, j + 1L)) = cells.getOrElse((i + 1L, j + 1L), 0L) +
          x(i) * x(j)
    }
    assert(got.length === 64 * 65 / 2)
    got.foreach { case (i, j, n, s) =>
      assert(n === vecs.length.toLong)
      assert(s === cells((i, j)), s"cell ($i,$j)")
    }
  }
}
