package graft.operators

import graft.{QueryDef, QueryPack, Tables}
import graft.functions.DecimalAvg
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

/** Extensibility showcase (SURVEY §7.2 step 5): queries built on the
  * engine's custom primitives — the typed [[DecimalAvg]] Aggregator here,
  * the [[graft.functions.SimHash64]] Catalyst expression in DedupOps.
  * Both run as ordinary partial+final aggregates / codegen'd projections,
  * so they inherit Spark's distribution for free.
  */
object CustomOps extends QueryPack {

  private val decimalAvg = QueryDef(
    "q_custom_decimal_avg",
    (s, d) => {
      import s.implicits._
      val avgUdaf = udaf(new DecimalAvg, Encoders.scalaDouble)
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          avgUdaf($"l_extendedprice").cast("decimal(38,6)").as("avg_price"),
          count("*").as("n_rows"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))) / count(*), 6) AS DECIMAL(38,6)) AS avg_price,
      count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    "Typed Aggregator: decimal-exact average (reference O9 semantics, " +
      "utils/load.py:33-35, made exact)")

  override def defs: Seq[QueryDef] = Seq(decimalAvg)
}
