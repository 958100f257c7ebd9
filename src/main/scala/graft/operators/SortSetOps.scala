package graft.operators

import graft.{QueryDef, QueryPack, Tables}
import org.apache.spark.sql.functions._

/** Sort/limit/top-k and set operations (SURVEY §2.2 ext tier).
  *
  * Scale posture: `orderBy(...).limit(k)` is planned as
  * TakeOrderedAndProject — each partition keeps a k-heap, the driver merges
  * k × partitions rows; no global sort ever materializes. Set ops are
  * shuffle-on-full-row distincts; at scale prefer keyed forms (here the
  * input is already projected to keys).
  */
object SortSetOps extends QueryPack {

  // ------------------------------------------------------- top-k
  private val sortTopK = QueryDef(
    "q_sort_limit_topk",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .select($"o_orderkey", $"o_custkey",
          $"o_totalprice".cast("decimal(18,2)").as("price_dec"))
        .orderBy($"price_dec".desc, $"o_orderkey")
        .limit(100)
        // top-k decided on the exact decimal; the cents-granular decimals
        // stay distinct in double, so the emitted order is unchanged
        .select($"o_orderkey", $"o_custkey", $"price_dec".cast("double").as("price"))
    },
    Some("""SELECT o_orderkey, o_custkey, CAST(price_dec AS DOUBLE) AS price
      FROM (SELECT o_orderkey, o_custkey,
          CAST(o_totalprice AS DECIMAL(18,2)) AS price_dec
        FROM orders ORDER BY price_dec DESC, o_orderkey LIMIT 100)
      ORDER BY price_dec DESC, o_orderkey"""),
    "Top-k via TakeOrderedAndProject (per-partition heaps, no global sort)")

  // ------------------------------------------------------ set ops
  // Key sets: customers ordering in 1995 vs in 1996.
  private def yearKeys(s: org.apache.spark.sql.SparkSession, d: String, y: Int) = {
    import s.implicits._
    Tables.orders(s, d).filter(year($"o_orderdate") === y)
      .select($"o_custkey").distinct()
  }

  private val setOps = QueryDef(
    "q_setops",
    (s, d) => {
      import s.implicits._
      val a = yearKeys(s, d, 1995)
      val b = yearKeys(s, d, 1996)
      val both = a.intersect(b).withColumn("tag", lit("both"))
      val only95 = a.except(b).withColumn("tag", lit("only_1995"))
      val any = a.union(b).distinct().withColumn("tag", lit("any"))
      both.unionAll(only95).unionAll(any)
        .orderBy($"tag", $"o_custkey")
    },
    Some("""WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
      b AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
      SELECT o_custkey, tag FROM (
        SELECT o_custkey, 'both' AS tag FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
        UNION ALL
        SELECT o_custkey, 'only_1995' AS tag FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
        UNION ALL
        SELECT o_custkey, 'any' AS tag FROM (SELECT * FROM a UNION SELECT * FROM b))
      ORDER BY tag, o_custkey"""),
    "union / intersect / except with distinct semantics on key sets")

  // ------------------------------------------------ multiset set ops
  // INTERSECT ALL / EXCEPT ALL (bag semantics: min / difference of
  // per-value multiplicities) over supplier keys from two quantity
  // bands. Ordering by (tag, value) makes the multiset deterministic —
  // equal rows are interchangeable.
  private val setOpsAll = QueryDef(
    "q_setops_all",
    (s, d) => {
      import s.implicits._
      val a = Tables.lineitem(s, d).filter($"l_quantity" < 25).select($"l_suppkey")
      val b = Tables.lineitem(s, d).filter($"l_quantity" >= 25).select($"l_suppkey")
      a.intersectAll(b).withColumn("tag", lit("inter_all"))
        .unionAll(a.exceptAll(b).withColumn("tag", lit("except_all")))
        .orderBy($"tag", $"l_suppkey")
    },
    Some("""SELECT l_suppkey, tag FROM (
        SELECT l_suppkey, 'inter_all' AS tag FROM (
          SELECT l_suppkey FROM lineitem WHERE l_quantity < 25
          INTERSECT ALL
          SELECT l_suppkey FROM lineitem WHERE l_quantity >= 25)
        UNION ALL
        SELECT l_suppkey, 'except_all' AS tag FROM (
          SELECT l_suppkey FROM lineitem WHERE l_quantity < 25
          EXCEPT ALL
          SELECT l_suppkey FROM lineitem WHERE l_quantity >= 25))
      ORDER BY tag, l_suppkey"""),
    "intersectAll / exceptAll multiset semantics on key bags")

  override def defs: Seq[QueryDef] = Seq(sortTopK, setOps, setOpsAll)
}
