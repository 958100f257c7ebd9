package graft

import org.apache.spark.sql.functions._

/** Corpus-composition tier: mixture weights + context chunking. The
  * fixture's docs are all shorter than one context window, so the
  * multi-chunk path is exercised against a purpose-built corpus with
  * long documents. */
class MixSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val longDocDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_chunk_corpus").toString
    Seq(
      (0L, ""), // zero tokens: no chunks
      (1L, "one"),
      (2L, ("w " * 128).trim), // exactly one window
      (3L, ("w " * 129).trim), // one stride past: 2 chunks
      (4L, ("w " * 1000).trim), // long doc
      // distinct numbered tokens: a mis-sliced chunk_text shows up as the
      // WRONG tokens, not just the wrong count
      (5L, (0 until 700).map(i => s"T$i").mkString(" "))
    ).toDF("doc_id", "text")
      .select($"doc_id", $"text", lit("xx").as("lang"),
        lit("synthetic").as("source"),
        length($"text").cast("long").as("n_chars"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q_text_chunk tiles every document: stride spacing, tail kept, no gaps") {
    val L = 128L; val stride = 96L
    val rows = SparkEntry.queries("q_text_chunk")(spark, longDocDir)
      .select($"doc_id", $"chunk_idx", $"start_tok", $"end_tok", $"chunk_len")
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(!rows.contains(0L), "zero-token doc emits no chunks")
    assert(rows(1L).map(r => (r._3, r._4)) === Seq((0L, 1L)))
    assert(rows(2L).map(r => (r._3, r._4)) === Seq((0L, 128L)))
    assert(rows(3L).map(r => (r._3, r._4)) === Seq((0L, 128L), (96L, 129L)))
    // 1000 tokens: chunks at 0,96,...; last chunk must END at n and every
    // token index must be covered
    val big = rows(4L)
    big.zipWithIndex.foreach { case ((_, idx, start, end, len), i) =>
      assert(idx === i.toLong)
      assert(start === i * stride)
      assert(end === math.min(start + L, 1000L))
      assert(len === end - start && len > 0 && len <= L)
    }
    assert(big.last._4 === 1000L, "tail chunk ends at n_tok")
    // no gaps: each chunk starts before the previous one ends (overlap 32)
    big.toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b._3 < a._4)
      case _ =>
    }
  }

  test("q_text_chunk round-trip: chunk_text is the declared slice; non-overlap concat rebuilds the stream") {
    val rows = SparkEntry.queries("q_text_chunk")(spark, longDocDir)
      .select($"doc_id", $"chunk_idx", $"start_tok", $"end_tok", $"chunk_text")
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val docs = spark.read.parquet(s"$longDocDir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(rows.keySet === docs.keySet - 0L)
    rows.foreach { case (doc, chunks) =>
      val toks = docs(doc).toLowerCase.split(" +").filter(_.nonEmpty)
      // each chunk's text is exactly the token slice its offsets declare
      chunks.foreach { case (_, _, s0, e0, txt) =>
        assert(txt === toks.slice(s0.toInt, e0.toInt).mkString(" "),
          s"doc $doc slice [$s0,$e0)")
      }
      // concatenating each chunk's not-yet-covered suffix reproduces the
      // original token stream exactly (MixSpec round-trip, VERDICT r9
      // task 6 done-gate)
      val rebuilt = chunks.foldLeft((Vector.empty[String], 0L)) {
        case ((acc, covered), (_, _, s0, e0, txt)) =>
          val ts = txt.split(' ')
          (acc ++ ts.drop((covered - s0).toInt), math.max(covered, e0))
      }._1
      assert(rebuilt === toks.toVector, s"doc $doc round trip")
    }
  }

  test("q_mix_weights: shares sum to ~1, smoothing pulls toward uniform, factors invert shares") {
    val rows = q("q_mix_weights")
      .select($"source", $"total_chars", $"actual_share", $"target_share",
        $"sampling_factor")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    val k = rows.length
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, "actual shares sum to 1")
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4, "target shares sum to 1")
    rows.foreach { case (src, _, actual, target, factor) =>
      assert(actual > 0 && target > 0 && factor > 0)
      // additive smoothing moves every share TOWARD uniform 1/k
      val uniform = 1.0 / k
      if (actual < uniform)
        assert(target >= actual - 1e-6 && target <= uniform + 1e-6, src)
      else
        assert(target <= actual + 1e-6 && target >= uniform - 1e-6, src)
      assert(math.abs(factor - target / actual) < 1e-3, s"$src factor")
    }
  }

  test("q_mix_sample realizes the q_mix_weights factors: copy counts exact, " +
      "realized mass tracks the target share") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = q("q_mix_sample").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val weights = q("q_mix_weights").collect().map(r =>
      r.getString(0) -> (r.getDouble(4), r.getDouble(5))).toMap // (target, factor)
    // every doc decided once; f_mil is the published factor in millionths
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length.toLong === nDocs)
    rows.groupBy(_._2).foreach { case (src, rs) =>
      val fMil = rs.head._3
      assert(rs.forall(_._3 == fMil), s"$src factor not constant")
      assert(fMil === math.round(weights(src)._2 * 1e6), s"$src f_mil")
      // copy counts are floor(f) or floor(f)+1, nothing else
      val base = fMil / 1000000L
      assert(rs.forall(r => r._4 == base || r._4 == base + 1), s"$src copies")
      // the hash-residue fractional copies land near frac(f)·n (binomial
      // tolerance: the decision is deterministic but hash-uniform)
      val extra = rs.count(_._4 == base + 1).toDouble / rs.length
      val frac = (fMil % 1000000L) / 1e6
      assert(math.abs(extra - frac) < 0.25, s"$src extra-copy rate $extra vs $frac")
    }
    // realized char mass per source approaches the declared target share
    val chars = Tables.documents(spark, sf)
      .select($"doc_id", $"n_chars".cast("long")).as[(Long, Long)].collect().toMap
    val mass = rows.groupBy(_._2).view
      .mapValues(_.map(r => chars(r._1) * r._4).sum.toDouble).toMap
    val total = mass.values.sum
    mass.foreach { case (src, m) =>
      assert(math.abs(m / total - weights(src)._1) < 0.05,
        s"$src realized share ${m / total} vs target ${weights(src)._1}")
    }
  }

  test("q_pipeline_shards packs exactly the cleaned chunk stream: bins " +
      "replay a local running-sum recompute, nothing dropped") {
    import graft.operators.{CleanPipelineOps, MixOps}
    val rows = q("q_pipeline_shards")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    // independent local replay: kept docs -> chunk-length sequence (the
    // q_text_chunk geometry) -> per-shard running sum -> bins
    val kept = CleanPipelineOps.keptDocs(spark, sf)
      .select($"doc_id", lower($"text")).as[(Long, String)]
      .collect().sortBy(_._1)
    val (len, stride) = (MixOps.ChunkLen, MixOps.ChunkStride)
    def chunkLens(t: String): Seq[Long] = {
      val n = t.split(" +").count(_.nonEmpty)
      if (n == 0) Nil
      else {
        val nc = if (n <= len) 1 else 1 + ((n - len + stride - 1) / stride)
        (0 until nc).map(i => (math.min(i * stride + len, n) - i * stride).toLong)
      }
    }
    val chunks = kept.flatMap { case (id, t) =>
      chunkLens(t).zipWithIndex.map { case (l, ci) => (id % 32, id, ci.toLong, l) } }
    val bins = chunks.groupBy(_._1).toSeq.flatMap { case (shard, cs) =>
      var cum = 0L
      cs.sortBy(c => (c._2, c._3)).map { c =>
        cum += c._4
        (shard, (cum - c._4) / 512, c._2, c._4)
      }
    }.groupBy(b => (b._1, b._2)).map { case ((shard, bin), bs) =>
      (shard, bin) -> (bs.length.toLong, bs.map(_._3).distinct.length.toLong,
        bs.map(_._4).sum, bs.map(_._3).min, bs.map(_._3).max)
    }
    assert(rows.length === bins.size)
    rows.foreach { case (shard, bin, nc, nd, st, fd, ld) =>
      val (wnc, wnd, wst, wfd, wld) = bins((shard, bin))
      assert((nc, nd, st, fd, ld) === ((wnc, wnd, wst, wfd, wld)),
        s"bin ($shard,$bin)")
    }
    // every kept chunk landed in exactly one bin
    assert(rows.map(_._3).sum === chunks.length.toLong)
  }

  test("q_mix_execute materializes exactly the q_mix_sample plan: row " +
      "multiplicities, dense copy indices, per-source char mass equal") {
    import spark.implicits._
    val plan = q("q_mix_sample").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(3))) // (doc_id, source, n_copies)
    val exec = q("q_mix_execute").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // each doc appears exactly n_copies times with copy_idx 1..n_copies
    val byDoc = exec.groupBy(_._1)
    plan.foreach { case (id, src, n) =>
      val copies = byDoc.getOrElse(id, Array.empty)
      assert(copies.length.toLong === n, s"doc $id multiplicity")
      assert(copies.map(_._2).sorted.toSeq === (1L to n).toSeq,
        s"doc $id copy indices not dense")
      assert(copies.forall(_._3 == src), s"doc $id source")
    }
    assert(exec.length.toLong === plan.map(_._3).sum, "total realized rows")
    // realized per-source char mass is EXACTLY the integer expectation
    // Σ n_chars·n_copies from the plan — the executor adds no sampling
    // noise on top of the plan's (the whole point of materializing it)
    val chars = Tables.documents(spark, sf)
      .select($"doc_id", $"n_chars".cast("long")).as[(Long, Long)].collect().toMap
    val expected = plan.groupBy(_._2).view
      .mapValues(_.map(p => chars(p._1) * p._3).sum).toMap
    val realized = exec.groupBy(_._3).view
      .mapValues(_.map(e => e._4).sum).toMap
    assert(realized === expected.filter(_._2 > 0))
  }
}
