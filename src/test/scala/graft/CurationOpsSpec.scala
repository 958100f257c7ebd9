package graft

import org.apache.spark.sql.functions._

/** Corpus-curation tier: CDC merge, stratified sampling, sequence
  * packing, scrubbing, decontamination (CurationOps). */
class CurationOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("q_merge_upsert: latest-wins per key, inserts added, updates applied") {
    val base = Tables.events(spark, sf)
    val nBase = base.count()
    val nIns = base.filter($"event_id" % 97 === 0).count()
    val merged = q("q_merge_upsert").cache()
    // one row per key; key set = base keys + shifted insert keys
    assert(merged.count() === nBase + nIns)
    assert(merged.select($"event_id").distinct().count() === nBase + nIns)
    // every 7th key took the newer (src=1, +100 cents) version
    val updated = merged.filter($"event_id" % 7 === 0 && $"event_id" < 10000000L)
    assert(updated.filter($"src" =!= 1L).count() === 0)
    // untouched keys carry the base row verbatim
    val untouched = merged.filter($"event_id" % 7 =!= 0 && $"event_id" < 10000000L)
    assert(untouched.filter($"src" =!= 0L).count() === 0)
    // updated values are base value + 100
    val baseCents = base.select($"event_id",
      ($"value".cast("decimal(18,2)") * 100).cast("long").as("vc"))
    val joined = updated.join(baseCents, "event_id")
    assert(joined.filter($"value_cents" =!= $"vc" + 100L).count() === 0)
    merged.unpersist()
  }

  test("q_merge_upsert is idempotent: re-merging the merged state is a no-op") {
    import org.apache.spark.sql.expressions.Window
    val merged = q("q_merge_upsert")
    // re-apply the exact recency reduction to merged ∪ merged — the
    // canonical MERGE property: replaying the same batch changes nothing
    val w = Window.partitionBy($"event_id").orderBy($"ts_s".desc, $"src".desc)
    val again = merged.unionByName(merged)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).drop("rn")
    assert(again.exceptAll(merged).count() === 0)
    assert(merged.exceptAll(again).count() === 0)
  }

  test("q_sample_stratified: kept counts equal the exact mod-rate recount") {
    val got = q("q_sample_stratified").collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_total"), r.getAs[Long]("n_kept")))).toMap
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"lang").as[(Long, String)].collect()
    val expect = docs.groupBy(_._2).map { case (lang, rows) =>
      val rate = lang match {
        case "en" => 50L; case "zh" => 25L; case _ => 10L
      }
      lang -> ((rows.size.toLong, rows.count(_._1 % 100 < rate).toLong))
    }
    assert(got === expect)
    // rates actually stratify: en keeps a much larger share than the rest
    val (enT, enK) = got("en")
    assert(enK.toDouble / enT > 0.35)
    got.filter(_._1 != "en").foreach { case (_, (t, k)) =>
      assert(k.toDouble / t < 0.35)
    }
  }

  test("q_pack_sequences: bins reconstruct from an independent per-shard scan") {
    val got = q("q_pack_sequences").collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("sum_tokens")))).toMap
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", size(split(lower($"text"), " +")).cast("long"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val expect = scala.collection.mutable.Map
      .empty[(Long, Long), (Long, Long)].withDefaultValue((0L, 0L))
    val cum = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    docs.foreach { case (id, n) =>
      val shard = id % 32
      val bin = cum(shard) / 512 // window where the doc's first token lands
      cum(shard) += n
      val (c, t) = expect((shard, bin))
      expect((shard, bin)) = (c + 1, t + n)
    }
    assert(got === expect.toMap)
    // packing invariant: consecutive bins per shard, none skipped
    got.keys.groupBy(_._1).foreach { case (_, bins) =>
      val bs = bins.map(_._2).toSeq.sorted
      assert(bs === (bs.min to bs.max))
    }
  }

  test("q_redact_scrub: no digits survive, counts match occurrences") {
    val rows = q("q_redact_scrub").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.getAs[String]("scrubbed").exists(_.isDigit))
      assert(r.getAs[Long]("scrub_len") ===
        r.getAs[String]("scrubbed").length.toLong)
    }
    // props are JSON with numeric values -> at least one hit per row
    assert(rows.count(_.getAs[Long]("n_hits") > 0) === rows.length)
  }

  test("q_decontaminate: per-doc overlap fraction and threshold decision " +
      "match a local recount") {
    def grams(text: String): Set[String] = {
      val w = text.toLowerCase.split(" +").toSeq
      if (w.size < 4) Set.empty
      else w.sliding(4).map(_.mkString(" ")).toSet
    }
    val all = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val testGrams = all.filter(_._1 % 50 == 0).flatMap(g => grams(g._2)).toSet
    // since round 9 every eligible corpus doc reports (including
    // zero-hit docs) plus the >= 20%-overlap contamination decision
    val expect = all.filter(_._1 % 50 != 0)
      .map { case (id, t) => id -> (grams(t).size, grams(t).count(testGrams.contains)) }
      .filter(_._2._1 > 0).toMap
    val got = q("q_decontaminate").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_sh"), r.getAs[Long]("n_hits"),
          r.getAs[Long]("contaminated"))).toMap
    assert(got.keySet === expect.keySet)
    got.foreach { case (id, (nSh, nHits, cont)) =>
      val (wSh, wHits) = expect(id)
      assert(nSh === wSh.toLong, s"doc $id n_sh")
      assert(nHits === wHits.toLong, s"doc $id n_hits")
      val frac = BigDecimal(new java.math.BigDecimal(wHits)
        .divide(new java.math.BigDecimal(wSh), 6, java.math.RoundingMode.HALF_UP))
      assert(cont === (if (frac >= BigDecimal("0.20")) 1L else 0L),
        s"doc $id contaminated flag")
    }
    // no test doc leaks into its own contamination report
    assert(got.keys.forall(_ % 50 != 0))
  }

  test("q_dsir_weights: exact per-doc recompute; target slice out-scores the rest") {
    val out = q("q_dsir_weights").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source").as[(Long, String)].collect().toMap
    // every document scored exactly once
    assert(out.map(_._1).toSet === docs.keySet)
    // corpus token-weighted mean in exact integers: Σ sum_mw / Σ n_tok
    // (equals Σ_b r_b·w_mil / R — every token carries its bucket ratio)
    val sTot = out.map(r => BigInt(r._3)).sum
    val rTot = out.map(r => BigInt(r._2)).sum
    out.foreach { case (id, nTok, sumMw, weight, selected) =>
      // weight recomputes exactly from the integer millionths (HALF_UP@6)
      val expect =
        if (nTok == 0) 0.0
        else (BigDecimal(sumMw).setScale(6) / BigDecimal(nTok * 1000000L))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(weight === expect, s"doc $id weight")
      // relative selection: doc mean ratio >= corpus token-weighted mean,
      // cross-multiplied in BigInt (the exact rule the query declares)
      val expSel = nTok > 0 && BigInt(sumMw) * rTot >= BigInt(nTok) * sTot
      assert(selected === (if (expSel) 1L else 0L), s"doc $id selected flag")
    }
    // the rule is a real partition at fixture scale: both sides non-empty
    assert(out.exists(_._5 == 1L) && out.exists(_._5 == 0L))
    // the importance identity: the token-weighted mean ratio over the
    // TARGET slice is >= the corpus mean (E_t[w] = E_r[w·(p_t/p_r)] >=
    // E_r[w] up to smoothing + rounding noise, with equality only when
    // target == raw). Tolerance covers the 6-decimal rounding.
    def meanW(ids: Iterable[(Long, Long, Long, Double, Long)]): Double = {
      val (mw, n) = ids.foldLeft((0L, 0L)) { case ((a, b), r) => (a + r._3, b + r._2) }
      mw.toDouble / (n * 1e6)
    }
    val (tgtRows, restRows) = out.partition(r => docs(r._1) == "src0")
    assert(tgtRows.nonEmpty && restRows.nonEmpty)
    assert(meanW(tgtRows) >= meanW(restRows) - 0.01,
      s"target mean ${meanW(tgtRows)} vs rest ${meanW(restRows)}")
  }
}
