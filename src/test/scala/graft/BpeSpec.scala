package graft

import org.apache.spark.sql.functions._
import graft.operators.BpeOps

/** BPE subword tokenization (q_text_bpe): round-trip decode, merge
  * determinism, and output invariants. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("BPE round-trips: concatenating a word's tokens reproduces the word") {
    val (merges, dictTok) = BpeOps.learnBpe(spark, sf)
    assert(merges.nonEmpty && merges.size <= BpeOps.Merges)
    val bad = dictTok
      .select($"word", concat_ws("", $"toks").as("joined"), $"n_tok",
        size($"toks").as("sz"))
      .filter($"word" =!= $"joined" || $"n_tok" =!= $"sz")
      .limit(5).collect()
    assert(bad.isEmpty, s"round-trip decode failed: ${bad.mkString(";")}")
    // merges actually compress: total tokens < total characters
    val (nTok, nChar) = dictTok
      .agg(sum($"n_tok"), sum(length($"word")).cast("long"))
      .as[(Long, Long)].head()
    assert(nTok < nChar, s"merges must compress the dict: $nTok vs $nChar")
    // no token is empty and no token contains the delimiter
    assert(dictTok.filter(exists($"toks",
      t => length(t) === 0 || t.contains(lit("\u0001")))).count() === 0L)
  }

  test("BPE learning is deterministic across runs") {
    // the UNCACHED loop twice — the memoized entry point would trivially
    // return the same object
    val (m1, _) = BpeOps.learnBpeUncached(spark, sf)
    val (m2, _) = BpeOps.learnBpeUncached(spark, sf)
    assert(m1 === m2)
  }

  test("merge application is greedy left-to-right (the [a,a,a] -> [aa,a] contract)") {
    // the wrapped-token string replace must behave as a left fold: for a
    // merge (a,a), three a's become [aa, a], not [a, aa]
    val D = "\u0001"
    val t = Seq(D + "a" + D + D + "a" + D + D + "a" + D).toDF("t")
      .select(replace($"t", lit(D + "a" + D + D + "a" + D), lit(D + "aa" + D)).as("t"))
      .select(split(expr("trim(BOTH char(1) FROM t)"), D + D).as("toks"))
      .as[Seq[String]].head()
    assert(t === Seq("aa", "a"))
  }

  test("q_text_bpe_ids: sequences align with q_text_bpe counts, no OOV at fixture vocab") {
    val counts = q("q_text_bpe").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val rows = q("q_text_bpe_ids").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length === counts.size)
    rows.foreach { case (doc, n, s) =>
      assert(n === counts(doc), s"doc $doc id-sequence length")
      val seq = if (s.isEmpty) Array.empty[String] else s.split(",")
      assert(seq.length.toLong === n)
      // the fixture's subword vocab fits the cap, so nothing is OOV
      assert(!seq.contains("0"), s"doc $doc has OOV ids")
    }
  }

  test("q_text_bpe: totals consistent with q_text_tokens' whitespace counts") {
    val bpe = q("q_text_bpe").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // n_bpe_tokens >= n_words (a word is at least one token) and docs
    // appear exactly once
    assert(bpe.values.forall { case (w, t) => t >= w })
    assert(bpe.keys.size.toLong === Tables.documents(spark, sf).count())
  }
}
