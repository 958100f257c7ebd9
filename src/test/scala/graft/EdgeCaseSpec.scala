package graft

import graft.functions.DecimalDot.decimal_dot
import graft.functions.RollingWinnow.rolling_winnow
import graft.functions.SimHash64.simhash64
import graft.functions.WordNGrams.word_ngrams
import graft.plans.AsOfJoin
import org.apache.spark.sql.functions._

/** Degenerate-input behavior of the custom primitives. */
class EdgeCaseSpec extends SparkTestBase {
  import spark.implicits._

  test("custom expressions propagate null inputs as null") {
    val df = Seq(Tuple1(Option.empty[Seq[String]])).toDF("t")
    assert(df.select(word_ngrams($"t", 3)).head().isNullAt(0))
    assert(df.select(simhash64($"t")).head().isNullAt(0))
    val fdf = Seq((Option.empty[Seq[Float]], Option(Seq(1.0f))))
      .toDF("a", "b")
    assert(fdf.select(decimal_dot($"a", $"b")).head().isNullAt(0))
    val sdf = Seq(Tuple1(Option.empty[String])).toDF("s")
    assert(sdf.select(rolling_winnow($"s", 12, 6)).head().isNullAt(0))
  }

  test("rolling_winnow on strings shorter than k returns empty") {
    val r = Seq("ab", "", "exactly-twelve!").toDF("s")
      .select(rolling_winnow($"s", 12, 6).as("fp")).as[Seq[Long]].collect()
    assert(r(0) === Seq.empty)
    assert(r(1) === Seq.empty)
    assert(r(2).nonEmpty) // 15 bytes >= k
  }

  test("empty arrays: ngrams/simhash/dot behave") {
    val df = Seq(Tuple1(Seq.empty[String])).toDF("t")
    assert(df.select(word_ngrams($"t", 3)).as[Seq[String]].head() === Seq.empty)
    df.select(simhash64($"t")).as[Long].head() // defined (all-zero counts)
    val fdf = Seq((Seq.empty[Float], Seq.empty[Float])).toDF("a", "b")
    // scale 6, matching the declared DecimalType(38,6) (ADVICE r5: the
    // runtime value used to carry a declared-vs-actual scale-9 mismatch)
    assert(fdf.select(decimal_dot($"a", $"b").cast("string")).as[String].head()
      === "0.000000")
  }

  test("as-of join with an EMPTY right side yields all-null matches") {
    val left = Seq((1L, "2020-01-01 00:00:00")).toDF("id", "t")
      .select($"id", $"t".cast("timestamp").as("t"))
    val right = Seq.empty[(java.sql.Timestamp, String)].toDF("rt", "tag")
    val got = AsOfJoin.asof(left, right, "t", "rt")
      .select($"id", $"tag").as[(Long, Option[String])].collect()
    assert(got.toSeq === Seq((1L, None)))
  }

  test("minhash_sig: null -> null, empty set -> identity (all Long.MaxValue)") {
    import graft.functions.MinHashSig.minhash_sig
    val nul = Seq(Tuple1(Option.empty[Seq[String]])).toDF("t")
    assert(nul.select(minhash_sig($"t", 8)).head().isNullAt(0))
    val empty = Seq(Tuple1(Seq.empty[String])).toDF("t")
      .select(minhash_sig($"t", 8)).as[Seq[Long]].head()
    assert(empty === Seq.fill(8)(Long.MaxValue),
      "the empty-set signature is the min-identity, so merging it is a no-op")
  }

  test("queries tolerate an all-filtered (empty) input path") {
    // between-filter with an impossible range: plan executes, returns 0 rows
    val empty = Tables.events(spark, sf)
      .filter($"ts".between(lit("1990-01-01"), lit("1990-01-02")))
    assert(empty.count() === 0)
    val agg = empty.groupBy(window($"ts", "5 minutes")).count()
    assert(agg.count() === 0)
  }
}
