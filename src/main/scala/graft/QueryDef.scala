package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine operator: a Spark query over the fixture tables plus
  * (where SQL-expressible) an equivalent DuckDB oracle query used by the
  * driver's hash-compare (SURVEY §2.2).
  *
  * Determinism contract for every `oracle.isDefined` query:
  *   - ends in a total ORDER BY on a unique key;
  *   - exact arithmetic (BIGINT counts / decimal sums) instead of raw float
  *     aggregates — doubles only where bit-identical across engines;
  *   - every output column explicitly cast to an unambiguous type
  *     (BIGINT / DOUBLE / VARCHAR / DECIMAL(38,s)) on BOTH sides, with the
  *     SAME alias on both sides (driver sorts columns by name before hashing).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "",
    // Oracle SQL that must be rendered AFTER the query ran (e.g. embeds a
    // filesystem path the query materialized). Evaluated once per
    // SparkEntry.oracleSql call; wins over `oracle` when both are set.
    oracleFn: Option[() => String] = None) {
  /** The oracle SQL as of now — lazy form first, else the static one. */
  def oracleNow: Option[String] = oracleFn.map(_()).orElse(oracle)
}

/** A family of related operators; SparkEntry concatenates all packs. */
trait QueryPack {
  def defs: Seq[QueryDef]
}
