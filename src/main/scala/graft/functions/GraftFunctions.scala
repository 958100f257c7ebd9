package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for the engine's custom expressions.
  *
  * Two registration paths:
  *  - [[GraftExtensions]]: the `SparkSessionExtensions` injection point —
  *    pass `.withExtensions(new GraftExtensions)` at session build (or
  *    `spark.sql.extensions=graft.functions.GraftExtensions` cluster-wide)
  *    and `simhash64` / `word_ngrams` / `decimal_dot` resolve in SQL text.
  *  - [[GraftFunctions.register]]: idempotent per-session registration for
  *    an already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptions.foreach(e.injectFunction)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)
  }
}

object GraftFunctions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft.functions", name, usage)

  private[functions] def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  // seeds are Long in the Scala API; the SQL path must accept the same
  // range (an int-only parse would silently reject seeds past 2^31)
  private[functions] def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be an integer or long literal, got $other")
  }

  /** (identifier, info, builder) triples as SparkSessionExtensions wants. */
  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<string>) - 64-bit SimHash"),
      (es: Seq[Expression]) => SimHash64(es.head)),
    (FunctionIdentifier("word_ngrams"),
      info("word_ngrams", "word_ngrams(array<string>, n) - distinct ordered n-grams"),
      (es: Seq[Expression]) => WordNGrams(es.head, intLit(es(1), "n"))),
    (FunctionIdentifier("decimal_dot"),
      info("decimal_dot", "decimal_dot(array<float>, array<float>) - exact decimal dot product"),
      (es: Seq[Expression]) => DecimalDot(es.head, es(1))),
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(array<string>, k) - k-permutation MinHash signature"),
      (es: Seq[Expression]) => MinHashSig(es.head, intLit(es(1), "k"))),
    (FunctionIdentifier("srp_sig"),
      info("srp_sig", "srp_sig(array<float>, bands, bits, seed) - multi-band SRP-LSH signature"),
      (es: Seq[Expression]) => SrpSig(es.head, intLit(es(1), "bands"),
        intLit(es(2), "bits"), longLit(es(3), "seed"))),
    (FunctionIdentifier("rad_sig"),
      info("rad_sig",
        "rad_sig(array<long>, bands, bits, seed) - Rademacher-SRP LSH signature of a scale-6 scaled vector"),
      (es: Seq[Expression]) => RadSig(es.head, intLit(es(1), "bands"),
        intLit(es(2), "bits"), longLit(es(3), "seed"))),
    (FunctionIdentifier("decimal_scale6"),
      info("decimal_scale6",
        "decimal_scale6(array<float>) - exact scale-6 unscaled longs"),
      (es: Seq[Expression]) => DecimalScale6(es.head)),
    (FunctionIdentifier("scaled_dot"),
      info("scaled_dot",
        "scaled_dot(array<long>, array<long>) - decimal dot of scale-6 longs"),
      (es: Seq[Expression]) => ScaledDot(es.head, es(1))),
    (FunctionIdentifier("double_dot"),
      info("double_dot", "double_dot(array<float>, array<float>) - IEEE-double dot product"),
      (es: Seq[Expression]) => DoubleDot(es.head, es(1))),
    (FunctionIdentifier("int8_quant_stats"),
      info("int8_quant_stats",
        "int8_quant_stats(array<float>) - int8 quantization code stats struct"),
      (es: Seq[Expression]) => Int8QuantStats(es.head)),
    (FunctionIdentifier("sorted_intersect_size"),
      info("sorted_intersect_size",
        "sorted_intersect_size(array<string>, array<string>) - |a ∩ b| of sorted distinct arrays"),
      (es: Seq[Expression]) => SortedIntersectSize(es.head, es(1))),
    (FunctionIdentifier("top_k_pairs"),
      info("top_k_pairs",
        "top_k_pairs(score, id, k) - bounded per-group top-k aggregate; " +
          "array<struct<score,id>> ordered (score DESC, id ASC)"),
      // bare AggregateFunction: the analyzer wraps it in AggregateExpression
      (es: Seq[Expression]) => TopKPairs(es.head, es(1), intLit(es(2), "k"))),
    (FunctionIdentifier("freq_items_sketch"),
      info("freq_items_sketch",
        "freq_items_sketch(item, capacity) - Misra-Gries frequent-items " +
          "aggregate; array<struct<item,cnt>> ordered (cnt DESC, item ASC)"),
      (es: Seq[Expression]) => FreqItemsSketch(es.head, intLit(es(1), "capacity"))))

  /** Idempotent registration on a live session. */
  def register(spark: SparkSession): Unit =
    descriptions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
