package graft

import graft.operators.SearchOps
import org.apache.spark.sql.functions._

/** The retrieval tier: inverted-index invariants, exact replay of the
  * millionths BM25-form scorer on a planted corpus, phrase-match
  * positions, and the bounded-postings guarantee. */
class SearchOpsSpec extends SparkTestBase {
  import spark.implicits._

  /** Write a tiny documents table and return its dir. */
  private def corpus(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_search").toString
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q_search_index: postings head is bounded at IndexTopP and ordered " +
      "(tf DESC, doc_id ASC); df/cf are exact") {
    val out = q("q_search_index")
      .select($"term", $"df", $"cf", $"postings")
      .as[(String, Long, Long, String)].collect()
    assert(out.nonEmpty)
    out.foreach { case (term, df, cf, postings) =>
      val posts = postings.split(",").map { p =>
        val Array(d, tf) = p.split(":"); (d.toLong, tf.toLong)
      }
      assert(posts.length <= SearchOps.IndexTopP, s"$term postings over cap")
      assert(posts.length == math.min(df, SearchOps.IndexTopP.toLong),
        s"$term must fill the head up to min(df, P)")
      // rank order: tf strictly descends, ties break by ascending doc_id
      posts.sliding(2).foreach {
        case Array((d1, t1), (d2, t2)) =>
          assert(t1 > t2 || (t1 == t2 && d1 < d2), s"$term head out of order")
        case _ =>
      }
      assert(cf >= df, s"$term cf (total occurrences) must be >= df")
      assert(posts.map(_._2).sum <= cf)
    }
  }

  test("q_search_index postings agree with a direct tf recompute") {
    val tf = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", explode(array_remove(split(lower($"text"), " +"), ""))
        .as("tok"))
      .groupBy($"tok", $"doc_id").agg(count(lit(1)).as("tf"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1)
    val out = q("q_search_index")
      .select($"term", $"postings").as[(String, String)].collect()
    out.foreach { case (term, postings) =>
      val expect = tf(term).map { case (_, d, t) => (d, t) }
        .sortBy { case (d, t) => (-t, d) }.take(SearchOps.IndexTopP).toSeq
      val got = postings.split(",").toSeq.map { p =>
        val Array(d, t) = p.split(":"); (d.toLong, t.toLong)
      }
      assert(got == expect, s"postings head for '$term' diverges")
    }
  }

  test("q_search_term: exact millionths scoring replayed on a planted " +
      "corpus; ranking is (score DESC, doc_id)") {
    // doc 1 matches two query terms, doc 2 one with saturation-heavy tf,
    // doc 3 none, doc 4 one occurrence of a common term
    val d = corpus(Seq(
      1L -> "spark window spark other",
      2L -> "merge merge merge merge merge",
      3L -> "nothing here at all",
      4L -> "window filler filler"))
    val out = SparkEntry.queries("q_search_term")(spark, d)
      .as[(Long, Long, Long)].collect()
    // replay: N=4; df(spark)=1, df(window)=2, df(merge)=1
    def mil(num: Long, den: Long): Long =
      (BigDecimal(num).setScale(2) / den)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .*(1000000L).toLongExact
    def sat(tf: Long): Long = mil(tf * 5, tf * 5 + 6)
    val wSpark = mil(3, 4); val wWindow = mil(2, 4); val wMerge = mil(3, 4)
    val expect = Seq(
      (1L, 2L, wSpark * sat(2) + wWindow * sat(1)),
      (2L, 1L, wMerge * sat(5)),
      (4L, 1L, wWindow * sat(1)))
      .sortBy { case (id, _, s) => (-s, id) }
    assert(out.toSeq == expect)
  }

  test("q_search_phrase: overlapping and repeated matches count per " +
      "occurrence; first_pos is the earliest token index") {
    val d = corpus(Seq(
      1L -> "spark window spark window",   // positions 0 and 2
      2L -> "x spark window y",            // position 1
      3L -> "window spark",                // reversed: no match
      4L -> ""))                            // empty doc
    val out = SparkEntry.queries("q_search_phrase")(spark, d)
      .as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 2L, 0L), (2L, 1L, 1L)))
  }

  test("q_search_hybrid_rrf: fusion is rank-only and exact — every row's " +
      "rrf_mil equals the millionths recompute from its own ranks") {
    val out = q("q_search_hybrid_rrf")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty && out.size <= SearchOps.SearchTopN)
    def mil(den: Long): Long =
      (BigDecimal(1).setScale(2) / den)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .*(1000000L).toLongExact
    out.foreach { case (id, lr, dr, rrf) =>
      val expect = (if (lr > 0) mil(SearchOps.RrfK + lr) else 0L) +
        (if (dr > 0) mil(SearchOps.RrfK + dr) else 0L)
      assert(rrf == expect, s"doc $id rrf mismatch")
      assert(lr > 0 || dr > 0, s"doc $id in neither input ranking")
      assert(lr <= SearchOps.SearchTopN && dr <= SearchOps.SearchTopN)
    }
    // fused order is (rrf DESC, doc_id): a doc ranked by BOTH systems
    // must outscore one ranked by a single system at similar depth
    assert(out.sliding(2).forall {
      case Seq((i1, _, _, r1), (i2, _, _, r2)) => r1 > r2 || (r1 == r2 && i1 < i2)
      case _ => true
    })
    // each input ranking is fully represented or truncated only by the
    // final top-N cut: ranks within a system are distinct
    assert(out.map(_._2).filter(_ > 0).distinct.size ==
      out.map(_._2).count(_ > 0))
    assert(out.map(_._3).filter(_ > 0).distinct.size ==
      out.map(_._3).count(_ > 0))
  }

  test("search results are deterministic across re-runs") {
    val a = q("q_search_term").collect()
    val b = q("q_search_term").collect()
    assert(a.toSeq == b.toSeq)
  }
}
