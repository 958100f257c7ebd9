package graft

import graft.functions.TopKPairs.top_k_pairs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The bounded-heap grouped top-k aggregate (functions/TopKPairs):
  * exact parity with the rank-window formulation on every supported
  * score type, merge path under repartition, null handling, SQL
  * registration, and the no-sort plan shape the kernel exists for. */
class TopKPairsSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference formulation: rank window ordered (score DESC, id ASC). */
  private def windowTopK(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
      .select($"g", $"rank", $"id", $"score")
  }

  private def aggTopK(df: DataFrame, k: Int): DataFrame =
    df.groupBy($"g")
      .agg(top_k_pairs($"score", $"id", k).as("tk"))
      .select($"g", posexplode($"tk"))
      .select($"g", ($"pos" + 1).cast("long").as("rank"),
        $"col.id".as("id"), $"col.score".as("score"))

  private def assertParity(df: DataFrame, k: Int): Unit = {
    val got = aggTopK(df, k).orderBy($"g", $"rank").collect()
    val ref = windowTopK(df, k).orderBy($"g", $"rank").collect()
    assert(got.toSeq === ref.toSeq)
  }

  test("parity with rank window: long scores, heavy ties, many partitions") {
    val rng = new scala.util.Random(11)
    // scores drawn from a tiny domain → massive ties; unique ids break them
    val rows = (1L to 5000L).map(i => (rng.nextInt(7).toLong, i, rng.nextInt(5).toLong))
    val df = rows.toDF("g", "id", "score").repartition(13)
    assertParity(df, 5)
    assertParity(df, 1)
    // k larger than any group: every row comes back
    assert(aggTopK(df, 100000).count() === 5000)
  }

  test("parity with rank window: double scores incl. negatives and zero") {
    val rng = new scala.util.Random(12)
    val rows = (1L to 3000L).map(i => (i % 5, i, rng.nextGaussian()))
    assertParity(rows.toDF("g", "id", "score").repartition(7), 4)
  }

  test("parity with rank window: decimal scores (the cosine dot type)") {
    val rng = new scala.util.Random(13)
    val rows = (1L to 2000L).map(i => (i % 3, i, BigDecimal(rng.nextInt(1000000), 6)))
    val df = rows.toDF("g", "id", "score")
      .select($"g", $"id", $"score".cast("decimal(38,6)").as("score"))
      .repartition(9)
    assertParity(df, 5)
  }

  test("null scores and null ids are ignored; empty group yields empty array") {
    val df = Seq[(Long, java.lang.Long, java.lang.Double)](
      (1L, 1L, 10.0), (1L, 2L, null), (1L, null, 99.0), (2L, 4L, null))
      .toDF("g", "id", "score")
    val r = df.groupBy($"g").agg(top_k_pairs($"score", $"id", 3).as("tk"))
      .select($"g", size($"tk").as("n")).orderBy($"g").collect()
    assert(r.map(x => (x.getLong(0), x.getInt(1))).toSeq === Seq((1L, 1), (2L, 0)))
  }

  test("SQL registration: top_k_pairs resolves and matches the Column API") {
    val rows = (1L to 500L).map(i => (i % 4, i, (i * 37 % 101).toDouble))
    rows.toDF("g", "id", "score").createOrReplaceTempView("tk_in")
    val viaSql = spark.sql(
      "SELECT g, top_k_pairs(score, id, 3) AS tk FROM tk_in GROUP BY g")
    val viaCol = rows.toDF("g", "id", "score").groupBy($"g")
      .agg(top_k_pairs($"score", $"id", 3).as("tk"))
    assert(viaSql.orderBy($"g").collect().toSeq ===
      viaCol.orderBy($"g").collect().toSeq)
  }

  test("plan: ObjectHashAggregate partial+final, no Sort below the aggregate") {
    val df = aggTopK((1L to 100L).map(i => (i % 2, i, i * 3 % 17))
      .toDF("g", "id", "score").repartition(5), 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_top_k_pairs"), plan)
    // the whole point: the scored stream is never sorted — the only
    // acceptable Sort would sit ABOVE the aggregate (none exists here;
    // the final orderBy lives outside this fragment)
    val sortBelowAgg = plan.linesIterator
      .dropWhile(l => !l.contains("ObjectHashAggregate"))
      .exists(_.contains("Sort "))
    assert(!sortBelowAgg, plan)
  }

  test("q_custom_topk_agg matches its window formulation on the fixture") {
    val got = q("q_custom_topk_agg").collect()
    val li = Tables.lineitem(spark, sf)
      .select($"l_returnflag".as("g"),
        ($"l_orderkey" * 10 + $"l_linenumber").cast("long").as("id"),
        $"l_extendedprice".as("score"))
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
    val ref = li.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .select($"g".as("l_returnflag"), $"rank", $"id".as("li_id"),
        $"score".as("price"))
      .orderBy($"l_returnflag", $"rank").collect()
    assert(got.toSeq === ref.toSeq)
  }

  test("exactTopK (cosine) still matches a window-based recompute") {
    import graft.functions.ScaledDot.{decimal_scale6, scaled_dot}
    val got = q("q_simsearch_cosine").collect()
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", decimal_scale6($"embedding").as("sv"))
    val queries = emb.filter($"vec_id" < operators.SimilarityOps.NQ)
      .select($"vec_id".as("qid"), $"sv".as("qvec"))
    val w = Window.partitionBy($"qid").orderBy($"dot".desc, $"cid")
    val ref = emb.select($"vec_id".as("cid"), $"sv".as("cvec"))
      .join(broadcast(queries))
      .filter($"qid" =!= $"cid")
      .select($"qid", $"cid", scaled_dot($"qvec", $"cvec").as("dot"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= operators.SimilarityOps.K)
      .select($"qid", $"cid", $"dot".cast("double").as("dot"), $"rank")
      .orderBy($"qid", $"rank").collect()
    assert(got.toSeq === ref.toSeq)
  }
}
