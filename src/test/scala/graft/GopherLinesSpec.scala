package graft

import org.apache.spark.sql.functions._

/** q_text_gopher_lines planted corpus (VERDICT r11 task 5): documents
  * with REAL embedded newlines plus sentence-derived lines, exercising
  * both Gopher line rules on both sides of each threshold. */
class GopherLinesSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files
      .createTempDirectory("graft_gopher_lines").toString
    Seq(
      // all-bullet doc (real newlines): 3/3 lines bullets -> reject
      1L -> "- alpha\n- beta\n- gamma",
      // plain prose, sentence-derived lines only -> keep
      2L -> "hello there. general kenobi. goodbye now",
      // ellipsis-heavy (real newlines): 3/4 lines end '...' -> reject
      3L -> "a...\nb...\nc...\nplain tail",
      // mixed: derived lines "* one." / "* two." / "plain" -> 2/3
      // bullets (<= 0.9) -> keep
      4L -> "* one. * two. plain"
    ).toDF("doc_id", "text")
      .select($"doc_id", $"text", lit("xx").as("lang"),
        lit("planted").as("source"),
        length($"text").cast("long").as("n_chars"))
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("bullet and ellipsis line rules fire on the planted corpus") {
    val rows = SparkEntry.queries("q_text_gopher_lines")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Long]("n_lines") === 3L)
    assert(rows(1L).getAs[Long]("n_bullet") === 3L)
    assert(rows(1L).getAs[Boolean]("lines_ok") === false, "all-bullet doc")
    assert(rows(2L).getAs[Long]("n_lines") === 3L, "sentence-derived lines")
    assert(rows(2L).getAs[Boolean]("lines_ok") === true)
    assert(rows(3L).getAs[Long]("n_ellipsis") === 3L)
    assert(rows(3L).getAs[Boolean]("lines_ok") === false, "ellipsis doc")
    assert(rows(4L).getAs[Long]("n_bullet") === 2L)
    assert(rows(4L).getAs[Boolean]("lines_ok") === true)
  }

  test("the rule is a pure per-row map: no exchange in the plan") {
    val plan = SparkEntry.queries("q_text_gopher_lines")(spark, dir)
      .queryExecution.executedPlan.toString
    // the only allowed exchange is the presentation sort's range
    // partitioning; no aggregation/join shuffle may appear
    assert(!plan.contains("hashpartitioning"),
      s"line rules must not shuffle data:\n$plan")
  }
}
