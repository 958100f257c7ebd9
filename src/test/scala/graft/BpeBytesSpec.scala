package graft

import org.apache.spark.sql.functions._
import graft.operators.BpeOps

/** q_bpe_bytes contract (VERDICT r12 task 4): byte-fallback encoding is
  * TOTAL — zero unseen ids — and round-trips exactly, including for
  * non-ASCII and astral words the trainer never saw. */
class BpeBytesSpec extends SparkTestBase {
  import spark.implicits._

  /** id → UTF-8 bytes decoder: 1..256 are the single bytes, 257+ the
    * learned subwords (their own UTF-8 bytes). */
  private def decoder(dir: String): Map[Long, Array[Byte]] = {
    val vocab = BpeOps.byteVocab(spark, dir).collect()
      .map(r => r.getAs[Long]("vid") -> r.getAs[String]("tok").getBytes("UTF-8"))
    ((1L to 256L).map(id => id -> Array((id - 1).toByte)) ++ vocab).toMap
  }

  private def roundTripAll(dir: String): Unit = {
    val dec = decoder(dir)
    val words = BpeOps.byteWordIds(spark, dir).collect()
    assert(words.nonEmpty)
    words.foreach { r =>
      val word = r.getAs[String]("word")
      val ids = r.getSeq[Long](r.fieldIndex("idl"))
      assert(r.getAs[Long]("nun") === 0L, s"unseen id for '$word'")
      val bytes = ids.toArray.flatMap(id =>
        dec.getOrElse(id, fail(s"undecodable id $id for '$word'")))
      assert(new String(bytes, "UTF-8") === word, s"round trip of '$word'")
    }
  }

  test("every held-out fixture word round-trips with zero unseen ids") {
    roundTripAll(sf)
  }

  test("non-ASCII and astral holdout words fall back to byte ids and " +
      "round-trip exactly") {
    val d = java.nio.file.Files
      .createTempDirectory("graft_bpe_bytes").toString
    val rows = Seq(
      // base slice: plain ASCII — the trainer never sees the glyphs below
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "data pipelines shuffle join aggregate and spill steadily",
      3L -> "plain ascii training text with ordinary words only",
      // holdout slice (doc_id % 10 == 0): unseen scripts + astral plane
      10L -> "café naïve 日本語 words",
      20L -> "astral 😀🚀 mixed téxt")
    rows.toDF("doc_id", "text")
      .select($"doc_id", $"text", lit("xx").as("lang"),
        lit("planted").as("source"),
        length($"text").cast("long").as("n_chars"))
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    roundTripAll(d)
    // the unseen glyphs really took the byte path (multi-byte chars →
    // several fallback ids each), and the declared query reports 0 unseen
    val out = SparkEntry.queries("q_bpe_bytes")(spark, d).collect()
    assert(out.map(_.getAs[Long]("n_fallback_ids")).sum > 0L,
      "planted non-ASCII words should exercise the byte fallback")
    assert(out.map(_.getAs[Long]("n_unseen")).sum === 0L)
    // fallback ids are all in the reserved 1..256 byte range
    val fallbackIds = BpeOps.byteWordIds(spark, d).collect()
      .filter(_.getAs[Long]("nfb") > 0L)
      .flatMap(_.getSeq[Long](1))
    assert(fallbackIds.exists(_ > 127L + 1L),
      "multi-byte UTF-8 should produce high byte ids")
  }
}
