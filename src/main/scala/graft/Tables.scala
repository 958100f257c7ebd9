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

  /** The fixture corpus has shipped `events.ts` in two vintages: parquet
    * TIMESTAMP(NANOS) (rounds 1–7), which Spark's vectorized reader only
    * accepts as a raw long (legacy mode), and TIMESTAMP(MICROS, NTZ)
    * (round 8+ regeneration). Load raw with the legacy flag on — it only
    * affects NANOS columns — and let [[normalizeTs]] branch on what
    * actually arrived. */
  def rawEvents(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
  }

  /** Normalize whatever vintage `ts` arrived in to session-zoned
    * TimestampType at microsecond grain (the type every downstream
    * window/watermark/unix_micros expression was written against):
    *  - raw-nanos long → integer `div` (never `/`: epoch-nanos exceed
    *    double's 2^53 exact range) then timestamp_micros;
    *  - TIMESTAMP_NTZ → cast, a pure reinterpretation under the UTC
    *    session timezone every entrypoint pins;
    *  - TimestampType → already there.
    * DuckDB reads either vintage natively, so the oracles compare at
    * epoch_us / whole-second grain unchanged. */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(rawEvents(s, d))

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
