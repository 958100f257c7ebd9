package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.{QueryDef, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink surface: the reference's one true source — HTTP JSON
  * payloads (O1, utils/extract.py:6-20) — as a DataSource V2 scan
  * ([[graft.sources.PayloadJsonSource]]) followed by the O3/O4/O5
  * clean-and-branch projection (utils/transform.py:9-31).
  *
  * The payload corpus is derived deterministically from the events
  * fixture (even event_id → price shape, odd → hashrate shape, one
  * malformed file → the reference's error path) and written under
  * target/ once per scale factor — test scaffolding standing in for the
  * HTTP hop, exactly like the reference's own mocked tests
  * (tests/test_transform.py:7-55).
  */
object SourceOps extends QueryPack {

  private val NPayloads = 300

  /** Deterministic payload corpus for one sf; idempotent. */
  def materializePayloads(s: SparkSession, d: String): String = {
    import s.implicits._
    val dir = Paths.get("/root/repo/target", "payloads", new java.io.File(d).getName)
    val marker = dir.resolve("_complete")
    if (Files.exists(marker)) return dir.toString
    Files.createDirectories(dir)
    val rows = Tables.events(s, d)
      .orderBy($"event_id").limit(NPayloads)
      .select($"event_id", unix_timestamp($"ts").as("ts_s"), $"value")
      .as[(Long, Long, Double)].collect()
    rows.foreach { case (id, tsS, v) =>
      val spiderTs = 1700000000L + id
      val json =
        if (id % 2 == 0)
          s"""{"spider_ts": $spiderTs, "price_data": {"USD": ${math.round(v)}, "time": $tsS}}"""
        else
          s"""{"spider_ts": $spiderTs, "hash_rate_data": {"currentHashrate": ${math.round(v * 1e6)}, "currentDifficulty": ${math.round(v * 1e4)}}}"""
      Files.write(dir.resolve(f"payload_$id%06d.json"),
        json.getBytes(StandardCharsets.UTF_8))
    }
    // one malformed payload: exercises the reference's swallow-and-log
    // error path (extract.py:14-19) without failing the scan
    Files.write(dir.resolve("payload_bad.json"),
      "{not json".getBytes(StandardCharsets.UTF_8))
    Files.write(marker, Array.empty[Byte])
    dir.toString
  }

  private val sourcePayload = QueryDef(
    "q_source_payload_json",
    (s, d) => {
      import s.implicits._
      val dir = materializePayloads(s, d)
      s.read.format("graft.sources.PayloadJsonSource")
        .option("path", dir).load()
        .select($"kind", $"spider_ts", $"usd", $"server_ts",
          $"hashrate", $"difficulty")
        .orderBy($"kind", $"spider_ts")
    },
    Some("""SELECT
      CASE WHEN price_data IS NOT NULL THEN 'price'
           WHEN hash_rate_data IS NOT NULL THEN 'hashrate'
           ELSE 'error' END AS kind,
      spider_ts,
      price_data.USD AS usd,
      CASE WHEN price_data IS NOT NULL THEN price_data.time
           WHEN hash_rate_data IS NOT NULL THEN spider_ts END AS server_ts,
      hash_rate_data.currentHashrate AS hashrate,
      hash_rate_data.currentDifficulty AS difficulty
      FROM read_json('/root/repo/target/payloads/sf0.01/*.json',
        format = 'auto', union_by_name = true, ignore_errors = true)
      ORDER BY kind, spider_ts"""),
    // (ignore_errors turns the malformed payload into an all-NULL row,
    // which the CASE maps to kind='error' — same as the DSv2 reader)
    "DataSource V2 scan of reference-shaped JSON payloads + O3/O4 typing")

  override def defs: Seq[QueryDef] = Seq(sourcePayload)
}
