package graft

import org.apache.spark.sql.functions._

/** q_text_salient_terms + q_profile_table: reference recomputes and
  * structural invariants. */
class SalienceProfileSpec extends SparkTestBase {
  import spark.implicits._

  test("q_text_salient_terms matches a local recompute") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", lower($"text")).as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" +").filter(_.nonEmpty).toSeq }
    val tf = docs.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, g) => (id, t, g.size.toLong) } }
    val df = tf.groupBy(_._2).map { case (t, g) => t -> g.size.toLong }
    def score(tfv: Long, dfv: Long): BigDecimal =
      (BigDecimal(tfv).setScale(2) / BigDecimal(dfv + 1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val want = tf.groupBy(_._1).toSeq.flatMap { case (id, terms) =>
      terms.toSeq.map { case (_, t, v) => (t, v, df(t), score(v, df(t))) }
        .sortBy { case (t, _, _, sc) => (-sc, t) }
        .take(5).zipWithIndex
        .map { case ((t, v, d, sc), i) =>
          (id, i + 1L) -> (t, v, d, sc.toDouble) }
    }.toMap
    val rows = q("q_text_salient_terms")
      .as[(Long, String, Long, Long, Double, Long)].collect()
    assert(rows.length === want.size)
    rows.foreach { case (id, term, tfv, dfv, sc, rank) =>
      val (wt, wtf, wdf, wsc) = want((id, rank))
      assert(term === wt, s"doc $id rank $rank term")
      assert(tfv === wtf && dfv === wdf, s"doc $id rank $rank tf/df")
      assert(sc === wsc, s"doc $id rank $rank score")
    }
  }

  test("q_profile_drift matches a local share recompute and its shares " +
      "sum to ~1e6 per (dim, side)") {
    import graft.operators.ProfileOps
    val rows = q("q_profile_drift")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"lang", $"source")
      .as[(Long, String, String)].collect()
    def mil(n: Long, tot: Long): Long =
      (BigDecimal(n).setScale(2) / tot)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .*(1000000L).toLongExact
    ProfileOps.DriftDims.foreach { dim =>
      def catOf(r: (Long, String, String)) = if (dim == "lang") r._2 else r._3
      val base = docs.filter(_._1 % 2 == 0)
      val neu = docs.filter(_._1 % 2 == 1)
      val cats = (base.map(catOf) ++ neu.map(catOf)).distinct.sorted
      val expect = cats.map { c =>
        val b = if (base.isEmpty) 0L
          else mil(base.count(catOf(_) == c).toLong, base.length.toLong)
        val n = if (neu.isEmpty) 0L
          else mil(neu.count(catOf(_) == c).toLong, neu.length.toLong)
        (dim, c, b, n, math.abs(b - n))
      }
      val got = rows.filter(_._1 == dim)
      assert(got == expect.toSeq, s"dim $dim drift rows diverge")
      // shares on each side are a distribution (up to per-category
      // rounding); TVD is within [0, 1e6]
      val bSum = got.map(_._3).sum; val nSum = got.map(_._4).sum
      assert(math.abs(bSum - 1000000L) <= got.size &&
        math.abs(nSum - 1000000L) <= got.size, s"$dim shares: $bSum/$nSum")
      val tvd = got.map(_._5).sum / 2
      assert(tvd >= 0L && tvd <= 1000000L)
    }
  }

  test("q_profile_table: invariants against the raw table") {
    val li = Tables.lineitem(spark, sf)
    val n = li.count()
    val rows = q("q_profile_table")
      .as[(String, Long, Long, Long, String, String)].collect()
    assert(rows.length === 6)
    rows.foreach { case (c, nRows, nNull, nDist, mn, mx) =>
      assert(nRows === n, s"$c n_rows")
      assert(nNull === li.filter(col(c).isNull).count(), s"$c n_null")
      assert(nDist === li.select(c).distinct().na.drop().count(), s"$c n_distinct")
      assert(mn.nonEmpty && mx.nonEmpty)
    }
    // numeric columns: rendered min <= max as NUMBERS (the render must
    // not have fallen back to lexical ordering)
    rows.filter(r => Set("l_orderkey", "l_quantity", "l_extendedprice")
        .contains(r._1))
      .foreach { case (c, _, _, _, mn, mx) =>
        assert(BigDecimal(mn) <= BigDecimal(mx), s"$c min<=max") }
  }

  test("q_profile_skew matches a local hot-key recompute (shares, " +
      "max share, Herfindahl) and its head is the true top-N") {
    import org.apache.spark.sql.functions._
    val rows = q("q_profile_skew")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1) === (1L to rows.length.toLong))
    val counts = Tables.events(spark, sf)
      .groupBy($"user_id").agg(count(lit(1)).as("cnt"))
      .as[(Long, Long)].collect()
    val total = counts.map(_._2).sum
    def shareMil(c: Long, denom: Long): Long =
      (BigDecimal(c) * 1000000 / denom)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
    val want = counts.sortBy(t => (-t._2, t._1)).take(rows.length)
    rows.zip(want).foreach { case ((_, uid, cnt, sm, nk, nr, ms, hhi), (wu, wc)) =>
      assert(uid === wu && cnt === wc)
      assert(sm === shareMil(wc, total))
      assert(nk === counts.length.toLong && nr === total)
      assert(ms === shareMil(counts.map(_._2).max, total))
      val sumsq = counts.map(c => BigInt(c._2) * BigInt(c._2)).sum
      assert(hhi === (BigDecimal(sumsq) * 1000000 /
        (BigDecimal(total) * total))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact)
    }
  }
}
