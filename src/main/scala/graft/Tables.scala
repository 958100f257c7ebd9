package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver parquet corpus (TESTDATA.md / FIXTURES.md §B).
  *
  * Every fixture table is columnar parquet; `spark.read.parquet` gives the
  * vectorized reader, and downstream `select`/`filter` get pushed into the
  * scan by Catalyst (predicate pushdown + column pruning) — the engine never
  * materializes unneeded columns. At cluster scale the same call works over
  * a directory of many files/partitions unchanged.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright. Read it as raw nanos (legacy long mode) and
    * truncate to microsecond timestamps — integer `div`, never `/`, since
    * epoch-nanos exceed double's 2^53 exact range. DuckDB keeps ns, so
    * oracle queries compare at whole-second / epoch_us grain only. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events").withColumn(
      "ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
