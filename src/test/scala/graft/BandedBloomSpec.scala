package graft

import org.apache.spark.sql.functions._

/** q_dedup_bloom_bands planted corpus (VERDICT r11 task 6): base docs
  * with delta-side exact copies, near-copies, and unrelated docs. The
  * MinHash family is a fixed deterministic hash set, so every assertion
  * here is exact, not probabilistic. */
class BandedBloomSpec extends SparkTestBase {
  import spark.implicits._

  private val baseA = "the quick brown fox jumps over the lazy dog " +
    "while the rain falls softly on the quiet green meadow all day"
  private val baseB = "data pipelines shuffle join aggregate and spill " +
    "until the cluster finally settles into a steady processing rhythm"

  private lazy val dir: String = {
    val d = java.nio.file.Files
      .createTempDirectory("graft_banded_bloom").toString
    val rows = Seq(
      // base slice (doc_id % 10 != 0)
      1L -> baseA,
      2L -> baseB,
      3L -> "an unrelated base document about mountains rivers and long hiking trails under a pale morning sky",
      // delta slice (doc_id % 10 == 0)
      10L -> baseA,                                  // exact copy -> J=1
      20L -> baseA.replace("rain", "snow"),          // near copy -> J~0.9
      30L -> "completely different delta text with nothing shared at all among these freshly invented words here",
      40L -> "another fully novel delta document covering cooking recipes and kitchen techniques in plain words"
    )
    rows.toDF("doc_id", "text")
      .select($"doc_id", $"text", lit("xx").as("lang"),
        lit("planted").as("source"),
        length($"text").cast("long").as("n_chars"))
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("planted recall 1.0 vs the exact incremental pass, and the " +
      "bloom gate sheds the unrelated delta docs") {
    val banded = SparkEntry.queries("q_dedup_bloom_bands")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    val exact = SparkEntry.queries("q_dedup_incremental")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("is_dup")).toMap
    // recall 1.0: every exact J>=0.5 dup is banded-found
    exact.foreach { case (id, isDup) =>
      if (isDup == 1L)
        assert(banded(id).getAs[Long]("is_dup") === 1L,
          s"banded gate missed exact dup $id")
    }
    // precision: nothing extra flagged
    banded.foreach { case (id, r) =>
      assert(r.getAs[Long]("is_dup") === exact(id), s"doc $id") }
    // the exact copy is found at J=1 through identical signatures
    assert(banded(10L).getAs[Double]("best_jaccard") === 1.0)
    assert(banded(20L).getAs[Long]("is_dup") === 1L, "near copy found")
    // the unrelated docs never reach the verify join (deterministic
    // for this fixed corpus + hash family)
    Seq(30L, 40L).foreach { id =>
      assert(banded(id).getAs[Long]("bloom_hit") === 0L,
        s"unrelated doc $id should be bloom-negative")
      assert(banded(id).getAs[Long]("n_dups") === 0L)
    }
    // invariant: a bloom-negative doc can never be a dup
    banded.values.foreach { r =>
      if (r.getAs[Long]("bloom_hit") === 0L)
        assert(r.getAs[Long]("is_dup") === 0L)
    }
  }

  test("the audit flags are green on the planted corpus") {
    val a = SparkEntry.queries("q_dedup_bloom_bands_audit")(spark, dir)
      .collect().head
    assert(a.getAs[Long]("bloom_lossless_ok") === 1L)
    assert(a.getAs[Long]("recall_ok") === 1L)
    assert(a.getAs[Long]("precision_ok") === 1L)
    assert(a.getAs[Long]("n_dup_docs") === 2L)
  }
}
