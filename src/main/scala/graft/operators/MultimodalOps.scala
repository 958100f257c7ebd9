package graft.operators

import graft.{QueryDef, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A media row as a training pipeline would model it: opaque binary
  * payload + typed metadata. */
case class MediaRow(
    media_id: Long,
    payload: Array[Byte],
    width: Int,
    height: Int,
    fmt: String)

/** Decoded features produced by the (stubbed) decoder. */
case class MediaFeatures(
    media_id: Long,
    n_bytes: Long,
    mean_byte: Double,
    hist_q1: Long, hist_q2: Long, hist_q3: Long, hist_q4: Long)

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata (the blueprint's multimodal mandate).
  *
  * The fixture corpus has no real media, so the payload is derived
  * deterministically from `documents.text` bytes, and the DECODER IS A
  * STUB — `fakeDecode` below stands in for a real image/audio decode
  * (the container has no media libraries). Everything around it is the
  * real Spark plumbing: binary columns survive parquet round-trips, the
  * typed `Dataset[MediaRow]` → `mapPartitions` → `Dataset[MediaFeatures]`
  * pipeline is exactly how a JVM-side decoder would batch per partition
  * (the Python-side equivalent is `mapInPandas` with the same schema).
  *
  * Scale posture: decode is embarrassingly parallel per partition; binary
  * payloads stay off the driver; metadata-only queries never touch the
  * payload column (parquet column pruning).
  */
object MultimodalOps extends QueryPack {

  /** The derived media table: payload = UTF-8 bytes of the text (stand-in
    * for real media bytes), metadata derived deterministically. */
  def media(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(
      $"doc_id".as("media_id"),
      $"text".cast("binary").as("payload"),
      (pmod($"doc_id", lit(64)) + 16).cast("int").as("width"),
      (pmod($"doc_id", lit(48)) + 12).cast("int").as("height"),
      concat(lit("fake/rgb8-"), $"lang").as("fmt"))
  }

  // ----------------------------------------------- metadata-only query
  // Never reads payload bytes beyond length — at scale this prunes the
  // binary column entirely out of the scan for the metadata aggregates.
  private val multimodalMeta = QueryDef(
    "q_multimodal_meta",
    (s, d) => {
      import s.implicits._
      media(s, d)
        .select($"media_id", $"width", $"height", $"fmt",
          length($"payload").cast("long").as("n_bytes"),
          ($"width" * $"height" * 3).cast("long").as("n_pixels_est"))
        .orderBy($"media_id")
    },
    Some("""SELECT doc_id AS media_id,
      CAST(doc_id % 64 + 16 AS INT) AS width,
      CAST(doc_id % 48 + 12 AS INT) AS height,
      'fake/rgb8-' || lang AS fmt,
      CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      CAST((doc_id % 64 + 16) * (doc_id % 48 + 12) * 3 AS BIGINT) AS n_pixels_est
      FROM documents ORDER BY media_id"""),
    "Typed media metadata over opaque binary payloads")

  // ------------------------------------------------ stubbed decode path
  /** STUB — stands in for a real media decode (no media libs in this
    * environment). Deterministic byte statistics keep the pipeline
    * testable; a real deployment swaps ONLY this function's body. */
  private def fakeDecode(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      val bytes = r.payload
      var sum = 0L
      val hist = new Array[Long](4)
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        sum += b
        hist(b >> 6) += 1
        i += 1
      }
      MediaFeatures(
        r.media_id, bytes.length.toLong,
        if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length,
        hist(0), hist(1), hist(2), hist(3))
    }

  private val multimodalFeatures = QueryDef(
    "q_multimodal_features",
    (s, d) => {
      import s.implicits._
      media(s, d).as[MediaRow]
        .mapPartitions(fakeDecode)
        .toDF()
        .select($"media_id", $"n_bytes",
          round($"mean_byte", 6).as("mean_byte"),
          $"hist_q1", $"hist_q2", $"hist_q3", $"hist_q4")
        .orderBy($"media_id")
    },
    None,
    "Per-partition batch decode (STUBBED) → typed feature rows")

  override def defs: Seq[QueryDef] = Seq(multimodalMeta, multimodalFeatures)
}
