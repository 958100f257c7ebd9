package graft

import graft.functions.{FreqItemsSketch, MGSummary}
import graft.functions.FreqItemsSketch.freq_items_sketch
import org.apache.spark.sql.functions._

/** Misra–Gries frequent-items aggregate (functions/FreqItemsSketch):
  * exact-regime equality with groupBy-count, the published guarantees in
  * the sketch regime under adversarial partitionings, the unit-level
  * decrement/merge mechanics, and SQL registration. */
class FreqItemsSpec extends SparkTestBase {
  import spark.implicits._

  /** Zipf-ish corpus: token t_i with frequency ∝ 1/(i+1), 40 distinct. */
  private def corpus(n: Int, seed: Int): Seq[String] = {
    val rng = new scala.util.Random(seed)
    val weights = (0 until 40).map(i => 1.0 / (i + 1))
    val total = weights.sum
    (1 to n).map { _ =>
      var u = rng.nextDouble() * total; var i = 0
      while (u > weights(i) && i < 39) { u -= weights(i); i += 1 }
      s"t$i"
    }
  }

  test("exact regime (capacity >= distinct): equals groupBy count, any partitioning") {
    val data = corpus(20000, 1)
    for (parts <- Seq(1, 7, 32)) {
      val got = data.toDF("term").repartition(parts)
        .agg(freq_items_sketch($"term", 64).as("hh"))
        .select(explode($"hh").as("e"))
        .select($"e.item", $"e.cnt")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val ref = data.groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .sortBy { case (t, c) => (-c, t) }
      assert(got === ref, s"parts=$parts")
    }
  }

  test("sketch regime: MG guarantees hold under every partitioning tried") {
    val data = corpus(30000, 2)
    val n = data.size.toLong
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (cap <- Seq(4, 8, 16); parts <- Seq(1, 5, 32)) {
      val got = data.toDF("term").repartition(parts)
        .agg(freq_items_sketch($"term", cap).as("hh"))
        .select(explode($"hh").as("e"))
        .select($"e.item", $"e.cnt")
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got.size <= cap)
      val bound = n / (cap + 1) // integer floor of the real bound — safe side
      got.foreach { case (t, est) =>
        val tc = truth.getOrElse(t, 0L)
        assert(est <= tc, s"cap=$cap parts=$parts $t est=$est > true=$tc")
        assert(est * (cap + 1) + n >= tc * (cap + 1),
          s"cap=$cap parts=$parts $t est=$est below floor for true=$tc")
      }
      truth.collect { case (t, tc) if tc * (cap + 1) > n => t }.foreach { t =>
        assert(got.contains(t), s"cap=$cap parts=$parts heavy hitter $t missing")
      }
    }
  }

  test("MGSummary unit mechanics: decrement-all and merge cut") {
    val m = new MGSummary(2)
    Seq("a", "a", "b", "c").foreach(m.offer) // c arrives full: a->1, b->0 evicted
    assert(m.sorted.toSeq === Seq(("a", 1L)))
    val x = new MGSummary(2); Seq("a", "a", "b").foreach(x.offer)
    val y = new MGSummary(2); Seq("c", "c", "c", "b").foreach(y.offer)
    x.mergeIn(y) // combined a=2 b=2 c=3, cut = 3rd largest (2) -> c=1 survives
    val merged = x.sorted.toMap
    assert(merged.size <= 2 && merged("c") === 1L)
  }

  test("nulls and empties: null items ignored; empty input yields empty array") {
    val df = Seq[(java.lang.Long, String)]((1L, "x"), (2L, null), (3L, "x"))
      .toDF("id", "term")
    val r = df.agg(freq_items_sketch($"term", 4).as("hh"))
      .select(explode($"hh").as("e")).select($"e.item", $"e.cnt").collect()
    assert(r.map(x => (x.getString(0), x.getLong(1))).toSeq === Seq(("x", 2L)))
    val empty = spark.emptyDataFrame.select(lit("z").as("term")).limit(0)
      .agg(freq_items_sketch($"term", 4).as("hh"))
      .select(size($"hh")).collect()
    assert(empty.head.getInt(0) === 0)
  }

  test("SQL registration matches the Column API") {
    corpus(2000, 3).toDF("term").createOrReplaceTempView("mg_in")
    val viaSql = spark.sql(
      "SELECT freq_items_sketch(term, 64) AS hh FROM mg_in").collect()
    val viaCol = corpus(2000, 3).toDF("term")
      .agg(freq_items_sketch($"term", 64).as("hh")).collect()
    assert(viaSql.toSeq === viaCol.toSeq)
  }

  test("q_text_heavy_hitters matches an exact groupBy-count recompute") {
    val got = q("q_text_heavy_hitters").collect()
    val exact = Tables.documents(spark, sf)
      .select($"lang", explode(split(lower($"text"), " +")).as("term"))
      .filter($"term" =!= "")
      .groupBy($"lang", $"term").agg(count("*").as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"n".desc, $"term")
    val ref = exact.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 10)
      .select($"lang", $"rank", $"term", $"n")
      .orderBy($"lang", $"rank").collect()
    assert(got.toSeq === ref.toSeq)
  }

  test("q_text_heavy_hitters_audit flags are all green") {
    val r = q("q_text_heavy_hitters_audit").collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getLong(row.fieldIndex("le_ok")) === 1L)
    assert(row.getLong(row.fieldIndex("floor_ok")) === 1L)
    assert(row.getLong(row.fieldIndex("hitters_ok")) === 1L)
  }
}
