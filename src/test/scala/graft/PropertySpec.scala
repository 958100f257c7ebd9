package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Algebraic invariants over generated inputs (SURVEY §5.2.3) — each
  * property runs the real operators on small random frames. ScalaCheck
  * generators are driven directly with fixed seeds (the scalatest-plus
  * bridge is not on the offline classpath), so every run is
  * deterministic.
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private val Runs = 10

  /** Deterministic samples from a generator. */
  private def samples[T](g: Gen[T]): Seq[T] =
    (1 to Runs).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private def forAll[A](g: Gen[A])(body: A => Unit): Unit =
    samples(g).foreach(body)

  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(body: (A, B) => Unit): Unit =
    samples(g1).zip(samples(g2)).foreach { case (a, b) => body(a, b) }

  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  private val rowsGen: Gen[List[(Long, Double)]] =
    Gen.listOfN(60, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0.0, 100.0)))

  test("property: dropDuplicates is idempotent") {
    forAll(rowsGen) { (rows: List[(Long, Double)]) =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("k", "v")
        val once = df.dropDuplicates("k")
        assert(once.dropDuplicates("k").count() === once.count())
        assert(once.count() === rows.map(_._1).distinct.size)
      }
    }
  }

  test("property: group avg lies within [min, max] of the group") {
    forAll(rowsGen) { (rows: List[(Long, Double)]) =>
      whenever(rows.nonEmpty) {
        val bad = rows.toDF("k", "v").groupBy($"k")
          .agg(avg($"v").as("a"), min($"v").as("mn"), max($"v").as("mx"))
          .filter($"a" < $"mn" - 1e-9 || $"a" > $"mx" + 1e-9)
        assert(bad.count() === 0)
      }
    }
  }

  test("property: union cardinality = sum; distinct union <= sum") {
    forAll(rowsGen, rowsGen) { (a: List[(Long, Double)], b: List[(Long, Double)]) =>
      val da = a.toDF("k", "v")
      val db = b.toDF("k", "v")
      assert(da.unionAll(db).count() === a.size + b.size)
      assert(da.union(db).distinct().count() <= a.size + b.size)
    }
  }

  test("property: salted aggregation equals direct aggregation") {
    forAll(rowsGen) { (rows: List[(Long, Double)]) =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("k", "v")
          .select($"k", $"v".cast("decimal(18,6)").as("v"))
        val direct = df.groupBy($"k")
          .agg(count("*").as("n"), sum($"v").cast("decimal(38,6)").as("s"))
          .as[(Long, Long, java.math.BigDecimal)].collect()
          .map(r => r._1 -> ((r._2, BigDecimal(r._3)))).toMap
        val salted = df.withColumn("salt", pmod(xxhash64($"v"), lit(8)))
          .groupBy($"k", $"salt")
          .agg(count("*").as("pn"), sum($"v").as("ps"))
          .groupBy($"k")
          .agg(sum($"pn").as("n"), sum($"ps").cast("decimal(38,6)").as("s"))
          .as[(Long, Long, java.math.BigDecimal)].collect()
          .map(r => r._1 -> ((r._2, BigDecimal(r._3)))).toMap
        assert(salted === direct)
      }
    }
  }

  test("property: simhash of a permuted bag is unchanged; ngrams ignore dup order") {
    import graft.functions.SimHash64.simhash64
    val tokensGen = Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d", "e"))
    forAll(tokensGen) { (toks: List[String]) =>
      whenever(toks.nonEmpty) {
        val perm = scala.util.Random.shuffle(toks)
        val h = Seq((toks, perm)).toDF("t1", "t2")
          .select(simhash64($"t1").as("h1"), simhash64($"t2").as("h2"))
          .as[(Long, Long)].head()
        assert(h._1 === h._2)
      }
    }
  }

  test("property: windowed sum of counts equals total count") {
    val tsGen = Gen.listOfN(50, Gen.choose(0L, 7200L))
    forAll(tsGen) { (offs: List[Long]) =>
      whenever(offs.nonEmpty) {
        val base = java.time.Instant.parse("2024-03-01T00:00:00Z").getEpochSecond
        val df = offs.map(o => new java.sql.Timestamp((base + o) * 1000L))
          .toDF("ts")
        val winSum = df.groupBy(window($"ts", "5 minutes")).count()
          .agg(sum($"count")).as[Long].head()
        assert(winSum === offs.size.toLong)
      }
    }
  }
}
