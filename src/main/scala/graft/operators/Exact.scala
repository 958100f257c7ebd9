package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's integer-millionths idiom in ONE place: the exact
  * rational num/den rounded HALF_UP to 6 decimals in DECIMAL, published
  * as BIGINT millionths — the arithmetic the bit-exact DuckDB oracle
  * contract hangs on (a precision/rounding change here must change the
  * Spark and SQL forms TOGETHER, which is why both live in this object).
  * Callers: the retrieval tier's idf/saturation/RRF weights, drift
  * shares, cohort/funnel rates. MixOps predates the helper and carries
  * the same expression inline with a weights-specific numerator.
  */
object Exact {

  /** BIGINT millionths of num/den (den an integral column, num cast
    * through DECIMAL(28,2) — the proven cross-engine division shape). */
  def mil(num: Column, den: Column): Column =
    (round(num.cast("decimal(28,2)") / den, 6)
      .cast("decimal(38,6)") * 1000000L).cast("long")

  /** The DuckDB rendering of [[mil]] over SQL expression strings. */
  def milSql(num: String, den: String): String =
    s"""CAST(CAST(round(CAST($num AS DECIMAL(28,2)) / ($den), 6)
      AS DECIMAL(38,6)) * 1000000 AS BIGINT)"""
}
