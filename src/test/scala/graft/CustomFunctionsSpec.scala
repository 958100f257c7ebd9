package graft

import graft.functions.SimHash64.simhash64
import graft.functions.WordNGrams.word_ngrams
import graft.functions.DecimalDot.decimal_dot
import org.apache.spark.sql.functions._

/** Custom Catalyst expressions: Column API + SQL registration surface. */
class CustomFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("word_ngrams equals the declarative HOF formulation") {
    val df = Tables.documents(spark, sf).limit(50)
      .select(split(lower($"text"), " +").as("t"))
    val got = df.select(word_ngrams($"t", 3).as("sh"))
      .as[Seq[String]].collect().map(_.toSet)
    val ref = df.select(
      when(size($"t") >= 3,
        array_distinct(transform(sequence(lit(1), size($"t") - 2),
          i => concat_ws(" ", element_at($"t", i), element_at($"t", i + 1),
            element_at($"t", i + 2)))))
        .otherwise(array().cast("array<string>")).as("sh"))
      .as[Seq[String]].collect().map(_.toSet)
    got.zip(ref).foreach { case (g, r) => assert(g === r) }
  }

  test("word_ngrams edge cases: short arrays, n=1") {
    val df = Seq(Seq("a"), Seq("a", "b"), Seq("a", "b", "c")).toDF("t")
    val r = df.select(word_ngrams($"t", 3).as("s")).as[Seq[String]].collect()
    assert(r(0) === Seq.empty)
    assert(r(1) === Seq.empty)
    assert(r(2) === Seq("a b c"))
    val u = df.select(word_ngrams($"t", 1).as("s")).as[Seq[String]].collect()
    assert(u(2) === Seq("a", "b", "c"))
  }

  test("simhash64 is deterministic and order-invariant on multisets") {
    val df = Seq(
      (1L, Seq("x", "y", "z")),
      (2L, Seq("z", "y", "x")), // same multiset, different order
      (3L, Seq("x", "y", "q"))).toDF("id", "t")
    val h = df.select($"id", simhash64($"t").as("h"))
      .as[(Long, Long)].collect().toMap
    assert(h(1L) === h(2L), "simhash over a bag ignores order")
    assert(h(1L) !== h(3L), "different bags should differ")
  }

  test("decimal_dot equals the declarative decimal chain") {
    val df = Tables.embeddings(spark, sf).limit(100)
      .select($"embedding".as("a"), $"embedding".as("b"))
    def dec9(c: org.apache.spark.sql.Column) =
      c.cast("double").cast("decimal(18,9)")
    val ref = df.select(round(
      aggregate(zip_with($"a", $"b", (x, y) => (dec9(x) * dec9(y)).cast("decimal(20,18)")),
        lit(0).cast("decimal(28,18)"), (acc, x) => (acc + x).cast("decimal(28,18)")),
      9).cast("decimal(38,9)").cast("string")).as[String].collect()
    val got = df.select(decimal_dot($"a", $"b").cast("string")).as[String].collect()
    got.zip(ref).foreach { case (g, r) => assert(BigDecimal(g) === BigDecimal(r)) }
  }

  test("custom functions resolve in SQL via extensions/registration") {
    Tables.documents(spark, sf).limit(5).createOrReplaceTempView("docs_tmp")
    val r = spark.sql(
      """SELECT doc_id, simhash64(split(lower(text), ' +')) AS h,
         size(word_ngrams(split(lower(text), ' +'), 3)) AS n
         FROM docs_tmp ORDER BY doc_id""").collect()
    assert(r.length === 5)
    assert(r.forall(_.getAs[Int]("n") >= 0))
  }
}
