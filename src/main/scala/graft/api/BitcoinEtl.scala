package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference user's API, end to end: everything
  * lyfer233/BitcoinMiningETL computes, as three calls on typed frames.
  *
  *   ingest(dir)            — O1/O3/O4/O5: payload JSON → typed
  *                            price/hashrate tables
  *                            (utils/extract.py:6-20, transform.py:9-31)
  *   appendRaw(t, dir)      — O6: the raw append sink
  *                            (transform.py:34-46 → parquet append)
  *   avgInfo(price, hash)   — O7-O13: per-5-minute averages of price and
  *                            hashrate/difficulty, flattened into one wide
  *                            row per window, with the reference's
  *                            previous-window price fallback
  *                            (utils/load.py:8-42)
  *   appendAvgInfo(df, dir) — O14: the avg_info append sink
  *                            (load.py:45-55)
  *
  * Differences from the reference, deliberate (SURVEY §7.4.3): typed
  * longs instead of str-cast numerics; one row per window instead of one
  * row per scheduler tick; decimal-exact averages (the reference wraps a
  * float division in Decimal, load.py:34-35); no ZeroDivisionError on an
  * empty hashrate window (the row is simply absent).
  */
object BitcoinEtl {

  /** Typed raw tables (the reference's `price` and `hashrate` MySQL
    * tables, init.sql:8-23). */
  case class RawTables(price: DataFrame, hashrate: DataFrame)

  /** Payload-shaped JSON directory → typed frames. The DSv2 source
    * already applies the reference's cleaning quirks (price-wins branch,
    * hashrate server_ts := spider_ts, error rows for bad payloads). */
  def ingest(spark: SparkSession, payloadDir: String): RawTables = {
    val raw = spark.read.format("graft.sources.PayloadJsonSource")
      .option("path", payloadDir).load()
    val price = raw.filter(col("kind") === "price")
      .select(col("usd"),
        timestamp_seconds(col("server_ts")).as("server_ts"),
        timestamp_seconds(col("spider_ts")).as("spider_ts"))
    val hashrate = raw.filter(col("kind") === "hashrate")
      .select(col("hashrate"), col("difficulty"),
        timestamp_seconds(col("server_ts")).as("server_ts"),
        timestamp_seconds(col("spider_ts")).as("spider_ts"))
    RawTables(price, hashrate)
  }

  /** O6/O14: append sink (the MySQL INSERT path as a parquet append). */
  def appendRaw(df: DataFrame, dir: String): Unit =
    df.write.mode("append").parquet(dir)

  /** The reference's one real query (O7-O13): 5-minute windowed averages
    * of both streams, joined at the window grain into the wide avg_info
    * row. Price windows with no rows fall back to the previous window's
    * average (O11, load.py:16-25); output rounds to 2 decimals like the
    * reference's f"{x:.2f}" (O13, load.py:52-53).
    */
  def avgInfo(price: DataFrame, hashrate: DataFrame): DataFrame = {
    def win(c: org.apache.spark.sql.Column) =
      unix_timestamp(window(c, "5 minutes").getField("start"))
    val p = price
      .groupBy(win(col("server_ts")).as("win_start"))
      .agg(sum(col("usd").cast("decimal(18,2)")).cast("decimal(38,2)").as("s"),
        count("*").as("n"))
      .select(col("win_start"),
        round(col("s") / col("n"), 2).cast("decimal(38,2)").as("avg_usd_w"))
    val h = hashrate
      .groupBy(win(col("server_ts")).as("win_start"))
      .agg(
        sum(col("hashrate").cast("decimal(28,0)")).cast("decimal(38,0)").as("sh"),
        sum(col("difficulty").cast("decimal(28,0)")).cast("decimal(38,0)").as("sd"),
        count("*").as("n"))
      .select(col("win_start"),
        round(col("sh") / col("n"), 2).cast("decimal(38,2)").as("avg_hashrate"),
        round(col("sd") / col("n"), 2).cast("decimal(38,2)").as("avg_difficulty"))
    // previous-window price fallback over the joint window axis
    val prevW = Window.orderBy(col("win_start"))
      .rowsBetween(Window.unboundedPreceding, -1)
    h.join(p, Seq("win_start"), "full_outer")
      .withColumn("avg_usd",
        coalesce(col("avg_usd_w"),
          last(col("avg_usd_w"), ignoreNulls = true).over(prevW)))
      .filter(col("avg_hashrate").isNotNull) // hashrate has no fallback (load.py:30-35)
      .select(col("win_start"),
        col("avg_usd").cast("double").as("avg_usd"),
        col("avg_hashrate").cast("double").as("avg_hashrate"),
        col("avg_difficulty").cast("double").as("avg_difficulty"))
      .orderBy(col("win_start"))
  }

  def appendAvgInfo(df: DataFrame, dir: String): Unit =
    df.write.mode("append").parquet(dir)
}
