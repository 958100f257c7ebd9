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
      (4L, ("w " * 1000).trim) // long doc
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
}
