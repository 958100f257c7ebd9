package graft

import org.apache.spark.sql.functions._
import graft.functions.{MediaCodec, PerceptualHash}
import graft.operators.MultimodalOps

/** q_dedup_media planted corpus + dHash kernel invariants (VERDICT r12
  * task 1). The corpus builder's plant rules (%10 exact copy, %14
  * brightness variant) are deterministic, so every assertion is exact. */
class MediaDedupSpec extends SparkTestBase {
  import spark.implicits._

  // ----------------------------------------------------- kernel invariants

  private val sampleTexts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a",
    "data pipelines shuffle join aggregate and spill until settled",
    "Z" * 300)

  test("dHash is exactly invariant under a uniform no-wrap brightness shift") {
    for (t <- sampleTexts; id <- Seq(0L, 2L, 34L, 96L)) {
      val tb = t.getBytes("UTF-8")
      val base = MediaCodec.encodeBmp(id, tb)
      val bright = MediaCodec.encodeBmp(id,
        tb.map(b => (b + MultimodalOps.BrightShift).toByte))
      assert(PerceptualHash.dhash(base) === PerceptualHash.dhash(bright),
        s"id=$id text=${t.take(16)}")
      // and the pixel streams DIFFER (it is a near-dup, not an exact dup)
      assert(!java.util.Arrays.equals(
        PerceptualHash.pixels(base), PerceptualHash.pixels(bright)))
    }
  }

  test("dHash and pixels return null for non-BMP / truncated payloads") {
    val wav = MediaCodec.encodeWav(1L, "hello".getBytes("UTF-8"))
    assert(PerceptualHash.dhash(wav) === null)
    assert(PerceptualHash.pixels(wav) === null)
    val bmp = MediaCodec.encodeBmp(2L, "hello".getBytes("UTF-8"))
    val truncated = bmp.take(bmp.length - 7)
    assert(PerceptualHash.dhash(truncated) === null, "pixel region OOB")
    assert(PerceptualHash.dhash(Array[Byte](1, 2, 3)) === null)
  }

  test("pixel extraction strips header and per-row padding") {
    val id = 2L // width 6 -> rowSize 20, 2 padding bytes per row
    val bmp = MediaCodec.encodeBmp(id, "abcdefgh".getBytes("UTF-8"))
    val w = (id % 32 + 4).toInt; val h = (id % 24 + 4).toInt
    val pix = PerceptualHash.pixels(bmp)
    assert(pix.length === w * 3 * h)
    // first pixel row = first w*3 data bytes (cyclic text fill)
    val expected = (0 until w * 3).map(i => "abcdefgh".charAt(i % 8).toByte)
    assert(pix.take(w * 3).toSeq === expected)
  }

  // ----------------------------------------------------- planted corpus

  private lazy val dir: String = {
    val d = java.nio.file.Files
      .createTempDirectory("graft_media_dedup").toString
    val rows = Seq(
      2L -> "an unrelated base document about mountains rivers and trails",
      4L -> "completely different text covering cooking recipes in plain words",
      6L -> "spark catalyst plans optimize joins aggregates and exchanges",
      // %10 == 0: gets a byte-identical planted copy
      10L -> "the quick brown fox jumps over the lazy dog all day long",
      20L -> "numbers one two three four five six seven eight nine ten",
      // %14 == 0: gets a +64 brightness planted variant
      14L -> "rain falls softly on the quiet green meadow through the night",
      28L -> "ships sail slowly across the wide grey harbor before dawn")
    rows.toDF("doc_id", "text")
      .select($"doc_id", $"text", lit("xx").as("lang"),
        lit("planted").as("source"),
        length($"text").cast("long").as("n_chars"))
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("planted exact copies and brightness variants are all found") {
    val found = SparkEntry.queries("q_dedup_media")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getLong(3))).toMap
    // byte-identical copies: Hamming 0, exact pixel verify fires
    for (id <- Seq(10L, 20L)) {
      val p = found.get((id, id + MultimodalOps.ExactOff))
      assert(p === Some((0, 1L)), s"exact copy of $id")
    }
    // brightness variants: Hamming 0 but pixels DIFFER — the pair a
    // byte-hash dedup structurally misses and the perceptual hash owns
    for (id <- Seq(14L, 28L)) {
      val p = found.get((id, id + MultimodalOps.BrightOff))
      assert(p === Some((0, 0L)), s"brightness variant of $id")
    }
    // no hallucinated pair between unrelated BASE images
    found.keys.foreach { case (a, b) =>
      assert(b >= MultimodalOps.ExactOff,
        s"unexpected base-base near-dup ($a,$b)")
    }
  }

  test("the audit recalls every exact pixel duplicate on the planted corpus") {
    val a = SparkEntry.queries("q_dedup_media_audit")(spark, dir)
      .collect().head
    assert(a.getAs[Long]("n_media") === 11L) // 7 base + 2 exact + 2 bright
    assert(a.getAs[Long]("n_exact_pairs") === 2L)
    assert(a.getAs[Long]("n_missed") === 0L)
    assert(a.getAs[Long]("recall_ok") === 1L)
    assert(a.getAs[Long]("n_bright_planted") === 2L)
    assert(a.getAs[Long]("n_bright_found") === 2L)
  }
}
