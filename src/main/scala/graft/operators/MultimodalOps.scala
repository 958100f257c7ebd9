package graft.operators

import graft.{QueryDef, QueryPack, Tables}
import graft.functions.MediaCodec
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** A media row as a training pipeline would model it: opaque binary
  * payload + typed metadata. */
case class MediaRow(
    media_id: Long,
    payload: Array[Byte],
    width: Int,
    height: Int,
    fmt: String)

/** Decoded features produced by the (stubbed) decoder. The byte sum is
  * kept exact (Long) so the mean can be derived decimal-exactly in the
  * plan — no float accumulation inside user code. */
case class MediaFeatures(
    media_id: Long,
    n_bytes: Long,
    sum_bytes: Long,
    hist_q1: Long, hist_q2: Long, hist_q3: Long, hist_q4: Long)

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata (the blueprint's multimodal mandate).
  *
  * The fixture corpus has no real media, so payloads are derived
  * deterministically from `documents.text` bytes. Two decode tiers:
  * `q_multimodal_decode` does REAL container parsing (BMP/WAV headers,
  * `functions/MediaCodec.scala` — no media library needed); the
  * `fakeDecode` byte-statistics path below remains a labeled stand-in
  * for codec-level decode (JPEG/MP3 etc. need libs this container
  * lacks). Everything around them is the
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
        r.media_id, bytes.length.toLong, sum,
        hist(0), hist(1), hist(2), hist(3))
    }

  // The fixture text is pure ASCII (verified: octet_length == length for
  // every doc), so DuckDB can recompute the byte statistics with ord()
  // over characters — which upgrades this from a rows-only check to a
  // full hash oracle.
  private val multimodalFeatures = QueryDef(
    "q_multimodal_features",
    (s, d) => {
      import s.implicits._
      media(s, d).as[MediaRow]
        .mapPartitions(fakeDecode)
        .toDF()
        .select($"media_id", $"n_bytes",
          round($"sum_bytes".cast("decimal(38,6)") / $"n_bytes", 6)
            .cast("decimal(38,6)").cast("double").as("mean_byte"),
          $"hist_q1", $"hist_q2", $"hist_q3", $"hist_q4")
        .orderBy($"media_id")
    },
    Some("""WITH b AS (
        SELECT doc_id,
          CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          list_transform(range(1, length(text) + 1),
            i -> ord(substring(text, i, 1))) AS bytes
        FROM documents)
      SELECT doc_id AS media_id, n_bytes,
        CAST(CAST(round(CAST(list_sum(bytes) AS DECIMAL(38,6)) / n_bytes, 6)
          AS DECIMAL(38,6)) AS DOUBLE) AS mean_byte,
        CAST(len(list_filter(bytes, x -> x // 64 = 0)) AS BIGINT) AS hist_q1,
        CAST(len(list_filter(bytes, x -> x // 64 = 1)) AS BIGINT) AS hist_q2,
        CAST(len(list_filter(bytes, x -> x // 64 = 2)) AS BIGINT) AS hist_q3,
        CAST(len(list_filter(bytes, x -> x // 64 = 3)) AS BIGINT) AS hist_q4
      FROM b ORDER BY media_id"""),
    "Per-partition batch decode (STUBBED) → typed feature rows")

  // ------------------------------------------------ REAL header decode
  // The decode stand-in retired (VERDICT r6 task 5): payloads are
  // well-formed BMP/WAV container bytes (built deterministically from
  // (doc_id, text) by MediaCodec.encode — fixture plumbing, clearly not
  // the measured operator), and the engine recovers width/height/bpp/
  // channels/sample_rate/bits/data_bytes by REAL byte-offset parsing in
  // a codegen'd Catalyst expression (functions/MediaCodec.scala). The
  // DuckDB oracle recomputes every field arithmetically from the
  // generator formulas, so a decoder that misreads any offset
  // hash-mismatches. Corrupt payloads decode to NULL, not task failures.
  // Scale posture: header-only decode touches a bounded byte prefix per
  // row, pixel/sample data never enters the row — the multimodal scan
  // pattern a 100 TB corpus needs.
  private val multimodalDecode = QueryDef(
    "q_multimodal_decode",
    (s, d) => {
      import s.implicits._
      val bin = Tables.documents(s, d)
        .select($"doc_id", encode($"text", "UTF-8").as("tb"))
        .as[(Long, Array[Byte])]
        .map { case (id, tb) => (id, MediaCodec.encode(id, tb)) }
        .toDF("media_id", "payload")
      bin.select($"media_id",
          MediaCodec.decodeMediaHeader($"payload").as("h"))
        .select($"media_id", $"h.kind".as("kind"),
          $"h.width".as("width"), $"h.height".as("height"),
          $"h.bpp".as("bpp"), $"h.channels".as("channels"),
          $"h.sample_rate".as("sample_rate"), $"h.bits".as("bits"),
          $"h.data_bytes".as("data_bytes"))
        .orderBy($"media_id")
    },
    Some("""SELECT doc_id AS media_id,
      CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS kind,
      CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 32 + 4 AS BIGINT) END AS width,
      CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 24 + 4 AS BIGINT) END AS height,
      CASE WHEN doc_id % 2 = 0 THEN CAST(24 AS BIGINT) END AS bpp,
      CASE WHEN doc_id % 2 = 1
        THEN CAST(CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 2 END AS BIGINT) END AS channels,
      CASE WHEN doc_id % 2 = 1
        THEN CAST(CASE doc_id % 8 WHEN 1 THEN 8000 WHEN 3 THEN 16000
                  WHEN 5 THEN 22050 ELSE 44100 END AS BIGINT) END AS sample_rate,
      CASE WHEN doc_id % 2 = 1 THEN CAST(16 AS BIGINT) END AS bits,
      CASE WHEN doc_id % 2 = 0
        THEN CAST((((doc_id % 32 + 4) * 3 + 3) // 4) * 4 * (doc_id % 24 + 4) AS BIGINT)
        ELSE CAST((octet_length(encode(text)) % 256 + 16) *
          (CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 2 END) * 2 AS BIGINT)
      END AS data_bytes
      FROM documents ORDER BY media_id"""),
    "REAL BMP/WAV header decode (codegen'd byte-offset parser) over " +
      "container payloads; oracle recomputes fields from generator formulas")

  // ------------------------------------------- perceptual near-dup
  // VERDICT r12 task 1: the multimodal family's own dedup. Perceptual
  // difference-hash (dHash) over the REAL decoded BMP pixels —
  // functions/PerceptualHash.scala grid-samples the pixel region the
  // same BmpPixels verify reads — banded 4×16 bits exactly like
  // q_dedup_simhash, candidates exact-byte-verified on the padding-free
  // pixel stream. The planted corpus has byte-identical copies (found
  // with exact_pixel=1) and uniformly-brightened variants (+64/byte:
  // pixel bytes differ, dHash provably identical → found at hamming 0
  // with exact_pixel=0 — the case a byte-hash dedup structurally
  // misses). Because the fixture payloads are generator-formula BMPs
  // (see q_multimodal_decode), DuckDB replays the ENTIRE path — pixels,
  // grid grays, hash bits, band collisions, Hamming — so this near-dup
  // query gets a full hash oracle, not just an audit.
  //
  // Scale posture: hash is a per-row codegen'd kernel over a bounded
  // byte region; candidate generation is the banded groupBy (never
  // all-pairs); the byte-verify joins back only candidate ids with
  // shuffle-hash build discipline (the minhashPairs rule).

  private[graft] val ExactOff = 1L << 40
  private[graft] val BrightOff = 1L << 41
  private[graft] val BrightShift = 64
  private[graft] val MaxHamming = 3

  /** The media-dedup corpus: every even doc_id is a base BMP; doc_id%10
    * adds a byte-identical copy, doc_id%14 a uniformly-brightened
    * variant (same dims — both encode with the BASE id). ASCII text
    * bytes are ≤ 127, so +64 never wraps — the shift is a true
    * brightness change, not a permutation. */
  private[graft] def dedupMediaCorpus(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d).filter($"doc_id" % 2 === 0)
      .select($"doc_id", encode($"text", "UTF-8").as("tb"))
      .as[(Long, Array[Byte])]
    val base = docs.map { case (id, tb) => (id, MediaCodec.encodeBmp(id, tb)) }
    val exact = docs.filter(_._1 % 10 == 0)
      .map { case (id, tb) => (id + ExactOff, MediaCodec.encodeBmp(id, tb)) }
    val bright = docs.filter(_._1 % 14 == 0)
      .map { case (id, tb) => (id + BrightOff,
        MediaCodec.encodeBmp(id, tb.map(b => (b + BrightShift).toByte))) }
    base.union(exact).union(bright).toDF("media_id", "payload")
  }

  /** The perceptual near-dup pair set (also the audit's subject):
    * banded dHash candidates, Hamming ≤ [[MaxHamming]], exact pixel
    * byte-verify flag per surviving pair. */
  private[graft] def mediaPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = dedupMediaCorpus(s, d)
    val sigs = media
      .select($"media_id", graft.functions.PerceptualHash.dhash64($"payload").as("ph"))
      .filter($"ph".isNotNull)
    // join-free candidate stream (the simhashPairs shape): band buckets →
    // ordered pairs carrying both hashes, Hamming as a per-row map
    val bands = sigs.select(struct($"media_id", $"ph").as("dn"),
      posexplode(array((0 to 3).map(b =>
        shiftrightunsigned($"ph", b * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bkey"))
    val cand = bands.groupBy($"band", $"bkey")
      .agg(sort_array(collect_list($"dn")).as("docs"))
      .select(graft.functions.OrderedPairs.ordered_pairs($"docs")
        .as(Seq("id1", "ph1", "id2", "ph2")))
      .select($"id1", $"id2",
        bit_count($"ph1".bitwiseXOR($"ph2")).cast("int").as("hamming"))
      .distinct()
      .filter($"hamming" <= MaxHamming)
    // exact byte-verify join-back on the padding-free pixel stream;
    // shuffle-hash hints keep the media side the build side (the
    // candidate stream's size is a Catalyst blind spot — it must never
    // be picked to build)
    val pix = media.select($"media_id",
      graft.functions.PerceptualHash.bmp_pixels($"payload").as("pix"))
    cand
      .join(pix.toDF("id1", "pix1").hint("shuffle_hash"), "id1")
      .join(pix.toDF("id2", "pix2").hint("shuffle_hash"), "id2")
      .select($"id1", $"id2", $"hamming",
        ($"pix1" === $"pix2").cast("long").as("exact_pixel"))
      .orderBy($"id1", $"id2")
  }

  /** Shared oracle CTE block: DuckDB replays payload pixels from the
    * generator formulas (cyclic text-byte fill over the BMP geometry,
    * padding excluded), then the 9×8 grid grays, the 64 hash bits, the
    * 4×16-bit band values, band-collision candidates, and per-pair
    * Hamming + pixel equality — the whole perceptual path, bit-for-bit. */
  private def mediaCtes: String = s"""dm AS (
      SELECT doc_id AS mid, doc_id AS gid, 0 AS shift, text
      FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id + $ExactOff, doc_id, 0, text
      FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + $BrightOff, doc_id, $BrightShift, text
      FROM documents WHERE doc_id % 14 = 0),
    geo AS (
      SELECT mid, shift, text,
        CAST(gid % 32 + 4 AS BIGINT) AS w,
        CAST(gid % 24 + 4 AS BIGINT) AS h,
        CAST(((gid % 32 + 4) * 3 + 3) // 4 * 4 AS BIGINT) AS rs,
        CAST(length(text) AS BIGINT) AS len
      FROM dm),
    px AS MATERIALIZED (
      SELECT mid, w, h,
        list_transform(range(0, w * h * 3), j ->
          CASE WHEN len = 0
            THEN ((j // (w * 3)) * rs + (j % (w * 3))) % 256
            ELSE CAST(ord(substring(text,
              CAST(((j // (w * 3)) * rs + (j % (w * 3))) % len AS INT) + 1, 1))
              AS BIGINT) + shift
          END) AS pix
      FROM geo),
    gr AS (
      SELECT mid, pix, w, h,
        list_transform(range(0, 72), k ->
          pix[CAST((h - 1 - (((k // 9) * h) // 8)) * (w * 3)
            + ((((k % 9) * w) // 9) * 3) AS INT) + 1]
          + pix[CAST((h - 1 - (((k // 9) * h) // 8)) * (w * 3)
            + ((((k % 9) * w) // 9) * 3) AS INT) + 2]
          + pix[CAST((h - 1 - (((k // 9) * h) // 8)) * (w * 3)
            + ((((k % 9) * w) // 9) * 3) AS INT) + 3]) AS gray
      FROM px),
    bt AS MATERIALIZED (
      SELECT mid, pix,
        list_transform(range(0, 64), k ->
          CASE WHEN gray[CAST((k // 8) * 9 + (k % 8) AS INT) + 2]
                  > gray[CAST((k // 8) * 9 + (k % 8) AS INT) + 1]
            THEN 1 ELSE 0 END) AS bits
      FROM gr),
    bk AS (
      SELECT mid, bits, band,
        CAST(list_sum(list_transform(range(0, 16), i ->
          bits[CAST(band * 16 + i AS INT) + 1] * (1 << CAST(i AS INT))))
          AS BIGINT) AS bkey
      FROM (SELECT mid, bits, unnest(range(0, 4)) AS band FROM bt)),
    cand AS (
      SELECT DISTINCT a.mid AS id1, b.mid AS id2
      FROM bk a JOIN bk b
        ON a.band = b.band AND a.bkey = b.bkey AND a.mid < b.mid),
    fp AS MATERIALIZED (
      SELECT c.id1, c.id2,
        CAST(len(list_filter(range(0, 64), k ->
          x.bits[CAST(k AS INT) + 1] <> y.bits[CAST(k AS INT) + 1]))
          AS INT) AS hamming,
        CAST(CASE WHEN x.pix = y.pix THEN 1 ELSE 0 END AS BIGINT) AS exact_pixel
      FROM cand c JOIN bt x ON c.id1 = x.mid JOIN bt y ON c.id2 = y.mid)"""

  private val mediaDedup = QueryDef(
    "q_dedup_media",
    (s, d) => mediaPairs(s, d),
    Some(s"""WITH $mediaCtes
      SELECT id1, id2, hamming, exact_pixel FROM fp
      WHERE hamming <= $MaxHamming ORDER BY id1, id2"""),
    "Perceptual (dHash) banded near-dup over decoded BMP pixels, exact " +
      "pixel byte-verify per pair; DuckDB replays the full path from the " +
      "generator formulas — full hash oracle")

  private val mediaDedupAudit = QueryDef(
    "q_dedup_media_audit",
    (s, d) => {
      import s.implicits._
      val media = dedupMediaCorpus(s, d)
      val pix = media.select($"media_id",
        graft.functions.PerceptualHash.bmp_pixels($"payload").as("pix"))
      // ground truth discovered INDEPENDENTLY of the perceptual path:
      // xxhash64 buckets over the pixel stream, full byte verify inside
      val pk = pix.select($"media_id", xxhash64($"pix").as("pk"))
      val gtCand = pk.select(struct($"media_id", $"pk").as("dn"), $"pk")
        .groupBy($"pk").agg(sort_array(collect_list($"dn")).as("docs"))
        .select(graft.functions.OrderedPairs.ordered_pairs($"docs")
          .as(Seq("id1", "k1", "id2", "k2")))
        .select($"id1", $"id2")
      val gt = gtCand
        .join(pix.toDF("id1", "pix1").hint("shuffle_hash"), "id1")
        .join(pix.toDF("id2", "pix2").hint("shuffle_hash"), "id2")
        .filter($"pix1" === $"pix2")
        .select($"id1", $"id2")
      val found = mediaPairs(s, d).cache()
      val missed = gt.join(found.select($"id1", $"id2"),
        Seq("id1", "id2"), "left_anti")
      val bright = Tables.documents(s, d)
        .filter($"doc_id" % 14 === 0) // multiples of 14 are even: all BMPs
        .select($"doc_id".as("id1"), ($"doc_id" + BrightOff).as("id2"))
      val brightFound = bright.join(found.filter($"hamming" === 0),
        Seq("id1", "id2"), "left_semi")
      media.agg(count(lit(1)).as("n_media"))
        .crossJoin(broadcast(gt.agg(count(lit(1)).as("n_exact_pairs"))))
        .crossJoin(broadcast(found.agg(count(lit(1)).as("n_found_pairs"))))
        .crossJoin(broadcast(missed.agg(count(lit(1)).as("n_missed"))))
        .crossJoin(broadcast(bright.agg(count(lit(1)).as("n_bright_planted"))))
        .crossJoin(broadcast(brightFound.agg(count(lit(1)).as("n_bright_found"))))
        .select($"n_media", $"n_exact_pairs", $"n_found_pairs", $"n_missed",
          ($"n_missed" === 0L).cast("long").as("recall_ok"),
          $"n_bright_planted", $"n_bright_found")
    },
    Some(s"""WITH $mediaCtes,
      gt AS (
        SELECT a.mid AS id1, b.mid AS id2
        FROM px a JOIN px b ON a.pix = b.pix AND a.mid < b.mid),
      fnd AS (SELECT id1, id2 FROM fp WHERE hamming <= $MaxHamming),
      msd AS (
        SELECT g.id1 FROM gt g LEFT JOIN fnd f
          ON g.id1 = f.id1 AND g.id2 = f.id2
        WHERE f.id1 IS NULL),
      bright AS (
        SELECT doc_id AS id1, doc_id + $BrightOff AS id2
        FROM documents WHERE doc_id % 14 = 0),
      bf AS (
        SELECT b.id1 FROM bright b JOIN fp f
          ON b.id1 = f.id1 AND b.id2 = f.id2 AND f.hamming = 0)
      SELECT
        CAST((SELECT count(*) FROM dm) AS BIGINT) AS n_media,
        CAST((SELECT count(*) FROM gt) AS BIGINT) AS n_exact_pairs,
        CAST((SELECT count(*) FROM fnd) AS BIGINT) AS n_found_pairs,
        CAST((SELECT count(*) FROM msd) AS BIGINT) AS n_missed,
        CAST(CASE WHEN (SELECT count(*) FROM msd) = 0 THEN 1 ELSE 0 END
          AS BIGINT) AS recall_ok,
        CAST((SELECT count(*) FROM bright) AS BIGINT) AS n_bright_planted,
        CAST((SELECT count(*) FROM bf) AS BIGINT) AS n_bright_found"""),
    "Media near-dup audit: exact pixel-duplicate ground truth (pixel-" +
      "hash buckets + byte verify, independent of the perceptual path) " +
      "must be fully recalled; planted brightness variants must land at " +
      "Hamming 0 — every scalar oracle-recomputed by full replay")

  // ------------------------------------------- perceptual similarity search
  // The multimodal family's SEARCH operator (q_dedup_media is its dedup):
  // top-k nearest images by dHash Hamming distance for a bounded probe
  // set, candidates generated by the same 4×16-bit band buckets (a probe
  // only scores index images sharing ≥1 band — never the full index).
  // Probes are the planted half-brightened variants below: +BrightShift
  // on the LEFT half of every pixel row changes exactly the grid
  // comparisons that straddle the half boundary (≤ 1 bit per hash row),
  // so probe→source distances spread over [0, 8] by content — a real
  // graded ranking, not a 0/∞ split. Banding is COLUMN-major (band i =
  // the 16 bits of grid columns i and i+4) rather than q_dedup_media's
  // contiguous row-wise bands: a vertical-edge perturbation — the
  // half-brightness class, and real-world crops/watermarks/letterboxing —
  // confines its flips to the columns it touches, so flips in one column
  // hit exactly ONE band (its column index mod 4), the other 3 bands
  // still match, and probe→source recall is STRUCTURAL (the audit pins
  // it), not probabilistic. Two columns per band keeps the key space at
  // 2^16 — single-column 8-bit keys have only 256 values, so their
  // bucket joins degenerate toward all-pairs as the corpus grows (the
  // first cut measured superlinear at the 10× stress). DuckDB replays pixels → grid
  // → bits → band keys → band join → Hamming → row_number, so the BANDED
  // semantics (including any probe whose true neighbor shares no band —
  // the honest ANN trade) get a full hash oracle; the audit quantifies
  // that trade against the brute-force ground truth.
  //
  // Scale posture: per-row codegen hash; candidate generation is an
  // equi-join on (band, bkey) with the bounded probe side as the
  // shuffle-hash build; ranking windows partition on probe_id (per-probe
  // candidate lists are band-bucket-bounded). Only the audit brute-forces
  // — probe hashes broadcast against the index, the exact re-score shape.

  private[graft] val ProbeOff = 1L << 42
  private[graft] val TopK = 5

  /** Left-half brightening: +[[BrightShift]] on every pixel byte in
    * columns [0, w/2) — geometry-aware, padding untouched. Callers must
    * exclude empty-text payloads (their generator pixels reach 255 and
    * would wrap; ASCII text bytes are ≤ 127 + 64 < 256). */
  private[graft] def halfBright(b: Array[Byte]): Array[Byte] = {
    val g = graft.functions.PerceptualHash.bmpGeometry(b)
    require(g != null, "probe fixtures are well-formed BMPs")
    val w = g(0); val h = g(1); val off = g(2); val rs = g(3)
    val out = b.clone()
    var r = 0
    while (r < h) {
      var i = off + r * rs
      val end = i + (w / 2) * 3
      while (i < end) { out(i) = (out(i) + BrightShift).toByte; i += 1 }
      r += 1
    }
    out
  }

  /** (index, probes) for the search corpus: index = every base BMP;
    * probes = half-brightened variants of doc_id % 6 == 0 (all even →
    * BMPs), empty-text docs excluded (wrap guard). */
  private[graft] def searchCorpus(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    import s.implicits._
    val docs = Tables.documents(s, d).filter($"doc_id" % 2 === 0)
      .select($"doc_id", encode($"text", "UTF-8").as("tb"))
      .as[(Long, Array[Byte])]
    val idx = docs.map { case (id, tb) => (id, MediaCodec.encodeBmp(id, tb)) }
      .toDF("media_id", "payload")
    val probes = docs.filter(t => t._1 % 6 == 0 && t._2.nonEmpty)
      .map { case (id, tb) =>
        (id + ProbeOff, halfBright(MediaCodec.encodeBmp(id, tb))) }
      .toDF("media_id", "payload")
    (idx, probes)
  }

  /** 4×16-bit COLUMN-major band explode of a (media_id, ph) signature
    * relation: band i collects bit (gy*8 + c) of each hash row gy for
    * its two columns c ∈ {i, i+4} — the grid-column grouping the
    * operator comment banks on, at a 2^16 key space. */
  private def phBands(sigs: DataFrame): DataFrame = {
    import sigs.sparkSession.implicits._
    def colKey(c: Int, at: Int) = (0 to 7).map(gy =>
      shiftleft(shiftrightunsigned($"ph", gy * 8 + c).bitwiseAND(lit(1L)),
        gy + at))
      .reduce(_ + _)
    def bandKey(i: Int) = colKey(i, 0) + colKey(i + 4, 8)
    sigs.select($"media_id", $"ph",
      posexplode(array((0 to 3).map(bandKey): _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bkey"))
  }

  private def phSig(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select($"media_id",
      graft.functions.PerceptualHash.dhash64($"payload").as("ph"))
      .filter($"ph".isNotNull)
  }

  /** Band-bucket candidate stream with exact Hamming from prebuilt
    * signatures — pre-rank (the audit checks self-candidacy here, before
    * top-k can push a source past rank K). The probe side is the
    * shuffle-hash build (bounded). */
  private def candFrom(psig: DataFrame, isig: DataFrame): DataFrame = {
    import psig.sparkSession.implicits._
    phBands(psig).toDF("probe_id", "php", "band", "bkey")
      .hint("shuffle_hash")
      .join(phBands(isig).toDF("neighbor_id", "phi", "band", "bkey"),
        Seq("band", "bkey"))
      .select($"probe_id", $"neighbor_id",
        bit_count($"php".bitwiseXOR($"phi")).cast("long").as("hamming"))
      .distinct()
  }

  private[graft] def mediaCand(s: SparkSession, d: String): DataFrame = {
    val (idx, probes) = searchCorpus(s, d)
    candFrom(phSig(probes), phSig(idx))
  }

  /** Per-probe rank ≤ [[TopK]] over a candidate stream. */
  private def topKFrom(cand: DataFrame): DataFrame = {
    import cand.sparkSession.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"probe_id").orderBy($"hamming", $"neighbor_id")
    cand.withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= TopK)
      .select($"probe_id", $"rnk", $"neighbor_id", $"hamming")
  }

  /** Banded top-k: candidates → per-probe rank. */
  private[graft] def mediaTopK(s: SparkSession, d: String): DataFrame =
    topKFrom(mediaCand(s, d))

  /** Oracle CTE chain for the search corpus: generator pixels (+64 on
    * the left half for probes) → 9×8 grid → 64 bits → band keys, both
    * unpivoted (sbk, for the band join) and pivoted (sbp, for Hamming
    * via per-band XOR popcounts), then banded candidates + distances. */
  private def searchCtes: String = searchCtesWith("")

  /** `idxExtra` appends a predicate to the INDEX branch only — the
    * post-forget oracle excludes deleted docs from the searchable side
    * while probes (the queries) stay untouched. */
  private def searchCtesWith(idxExtra: String): String = s"""sm AS (
      SELECT doc_id AS mid, doc_id AS gid, 0 AS half, text
      FROM documents WHERE doc_id % 2 = 0 $idxExtra
      UNION ALL
      SELECT doc_id + $ProbeOff, doc_id, 1, text
      FROM documents WHERE doc_id % 6 = 0 AND length(text) > 0),
    sgeo AS (
      SELECT mid, half, text,
        CAST(gid % 32 + 4 AS BIGINT) AS w,
        CAST(gid % 24 + 4 AS BIGINT) AS h,
        CAST(((gid % 32 + 4) * 3 + 3) // 4 * 4 AS BIGINT) AS rs,
        CAST(length(text) AS BIGINT) AS len
      FROM sm),
    spx AS MATERIALIZED (
      SELECT mid, w, h,
        list_transform(range(0, w * h * 3), j ->
          (CASE WHEN len = 0
            THEN ((j // (w * 3)) * rs + (j % (w * 3))) % 256
            ELSE CAST(ord(substring(text,
              CAST(((j // (w * 3)) * rs + (j % (w * 3))) % len AS INT) + 1, 1))
              AS BIGINT) END)
          + CASE WHEN half = 1 AND (j % (w * 3)) // 3 < w // 2
              THEN $BrightShift ELSE 0 END) AS pix
      FROM sgeo),
    sgr AS (
      SELECT mid, w, h,
        list_transform(range(0, 72), k ->
          pix[CAST((h - 1 - (((k // 9) * h) // 8)) * (w * 3)
            + ((((k % 9) * w) // 9) * 3) AS INT) + 1]
          + pix[CAST((h - 1 - (((k // 9) * h) // 8)) * (w * 3)
            + ((((k % 9) * w) // 9) * 3) AS INT) + 2]
          + pix[CAST((h - 1 - (((k // 9) * h) // 8)) * (w * 3)
            + ((((k % 9) * w) // 9) * 3) AS INT) + 3]) AS gray
      FROM spx),
    sbt AS MATERIALIZED (
      SELECT mid,
        list_transform(range(0, 64), k ->
          CASE WHEN gray[CAST((k // 8) * 9 + (k % 8) AS INT) + 2]
                  > gray[CAST((k // 8) * 9 + (k % 8) AS INT) + 1]
            THEN 1 ELSE 0 END) AS bits
      FROM sgr),
    sbk AS (
      SELECT mid, band,
        CAST(list_sum(list_transform(range(0, 8), gy ->
          bits[CAST(gy * 8 + band AS INT) + 1] * (1 << CAST(gy AS INT))))
          + list_sum(list_transform(range(0, 8), gy ->
          bits[CAST(gy * 8 + band + 4 AS INT) + 1]
            * (1 << CAST(gy + 8 AS INT))))
          AS BIGINT) AS bkey
      FROM (SELECT mid, bits, unnest(range(0, 4)) AS band FROM sbt)),
    sbp AS MATERIALIZED (
      SELECT mid,
        max(CASE WHEN band = 0 THEN bkey END) AS b0,
        max(CASE WHEN band = 1 THEN bkey END) AS b1,
        max(CASE WHEN band = 2 THEN bkey END) AS b2,
        max(CASE WHEN band = 3 THEN bkey END) AS b3
      FROM sbk GROUP BY mid),
    scand AS (
      SELECT DISTINCT p.mid AS probe_id, i.mid AS neighbor_id
      FROM sbk p JOIN sbk i ON p.band = i.band AND p.bkey = i.bkey
      WHERE p.mid >= $ProbeOff AND i.mid < $ProbeOff),
    shm AS (
      SELECT c.probe_id, c.neighbor_id,
        CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
           + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
          AS BIGINT) AS hamming
      FROM scand c JOIN sbp x ON c.probe_id = x.mid
        JOIN sbp y ON c.neighbor_id = y.mid)"""

  /** The banded-top-k oracle — shared verbatim by the per-run search
    * and the persisted-index search (same declared result: the index
    * changes WHERE signatures come from, never what they are). */
  private def searchOracleSql: String = s"""WITH $searchCtes
      SELECT CAST(probe_id AS BIGINT) AS probe_id,
        CAST(row_number() OVER (PARTITION BY probe_id
          ORDER BY hamming, neighbor_id) AS BIGINT) AS rnk,
        CAST(neighbor_id AS BIGINT) AS neighbor_id, hamming
      FROM shm QUALIFY rnk <= $TopK ORDER BY probe_id, rnk"""

  private val mediaSearch = QueryDef(
    "q_simsearch_media",
    (s, d) => {
      import s.implicits._
      mediaTopK(s, d).orderBy($"probe_id", $"rnk")
    },
    Some(searchOracleSql),
    "Perceptual top-k image search: banded dHash candidates, exact " +
      "Hamming re-rank per probe; DuckDB replays pixels->bits->bands->" +
      "rank from the generator formulas — full hash oracle")

  // ------------- persisted band-signature index (r14, VERDICT r13 task 4)
  // q_simsearch_media re-encodes and re-hashes the whole corpus on every
  // search — right for a one-off, wrong for a serving path. The search
  // family's LSM pattern (q_stream_index_maintain/_compact) applied to
  // the signature index: a PERSISTED (media_id, ph, band, bkey) relation,
  // hive-partitioned by generation — the base build hashes only the base
  // slice, an incremental maintain pass hashes ONLY the delta slice
  // (the family's HoldoutMod split) and lands it as new gen=1 files with
  // the base files byte-untouched (MediaSearchSpec). Rows carry the full
  // signature alongside each band key, so the probe join needs no
  // second lookup to re-rank (the simhash pair-carry trick). Search is
  // then: hash the BOUNDED probe set, one shuffle-hash equi-join on
  // (band, bkey) against the index read (union of generations), exact
  // Hamming, per-probe rank — the corpus is never re-read, never
  // re-hashed. Same declared output as q_simsearch_media, so the SAME
  // full pixel-replay hash oracle checks it; the spec additionally pins
  // indexed == per-run-rebuilt row-for-row and that the search plan
  // scans the index artifact, not the media corpus.
  //
  // Scale posture: index rows are 4 longs + an id (metadata-narrow,
  // ~40 B/row × 4/image); the maintain pass is delta-sized; at 100 TB
  // the search reads an index many orders smaller than the corpus and
  // the (band, bkey) layout can bucket-partition for probe-side pruning.

  /** One generation's media slice, ENCODED ONLY FOR THAT SLICE — the
    * incremental-maintain contract (filter before the encode map).
    * `keep` further restricts the slice (the forget rewrite passes the
    * survivor predicate). */
  private def indexSlice(s: SparkSession, d: String, delta: Boolean,
      keep: org.apache.spark.sql.Column = lit(true)): DataFrame = {
    import s.implicits._
    val lay = GenerationLayout.MediaIndex
    Tables.documents(s, d).filter(lay.slice($"doc_id"))
      .filter(lay.genSlice($"doc_id", delta))
      .filter(keep)
      .select($"doc_id", encode($"text", "UTF-8").as("tb"))
      .as[(Long, Array[Byte])]
      .map { case (id, tb) => (id, MediaCodec.encodeBmp(id, tb)) }
      .toDF("media_id", "payload")
  }

  private def bandRows(slice: DataFrame): DataFrame =
    phBands(phSig(slice)).toDF("media_id", "ph", "band", "bkey")

  /** Base build: signature+band rows of the base slice, gen=0. */
  private[graft] def writeMediaIndexBase(s: SparkSession, d: String,
      dir: String): Unit =
    bandRows(indexSlice(s, d, delta = false))
      .withColumn("gen", lit(0))
      .write.mode("overwrite").partitionBy("gen").parquet(dir)

  /** Incremental maintain: ONLY the delta slice is hashed; lands as new
    * gen=1 files, base generation byte-untouched. */
  private[graft] def appendMediaIndexDelta(s: SparkSession, d: String,
      dir: String): Unit =
    bandRows(indexSlice(s, d, delta = true))
      .withColumn("gen", lit(1))
      .write.mode("append").partitionBy("gen").parquet(dir)

  /** One-pass two-generation build for the forget query's SCRATCH store
    * (r16, guide §1.2): q_media_index_forget rebuilds per invocation and
    * the phased base+delta helpers each re-ran the encode+hash map over
    * their slice — gen derived from the id lands the identical
    * (gen=0, gen=1) layout in ONE pass and ONE write. The phased
    * helpers stay as the maintain-path contract (delta-only hashing)
    * and the stamped artifact's builder. */
  private[graft] def buildMediaIndexStore(s: SparkSession, d: String,
      dir: String): Unit = {
    import s.implicits._
    val lay = GenerationLayout.MediaIndex
    val slice = Tables.documents(s, d).filter(lay.slice($"doc_id"))
      .select($"doc_id", encode($"text", "UTF-8").as("tb"))
      .as[(Long, Array[Byte])]
      .map { case (id, tb) => (id, MediaCodec.encodeBmp(id, tb)) }
      .toDF("media_id", "payload")
    bandRows(slice)
      .withColumn("gen", lay.genOfInt($"media_id"))
      .write.mode("overwrite").partitionBy("gen").parquet(dir)
  }

  /** The persisted index artifact, stamped per corpus version. */
  private[graft] def mediaIndexDir(s: SparkSession, d: String): String = {
    val dir = graft.streaming.StreamingOps
      .indexArtifactDir("media_band_index", d)
    val marker = dir.resolve("_complete")
    val stamp = graft.FixtureStamp.stamp("v1", d, "documents")
    if (graft.FixtureStamp.upToDate(marker, stamp)) return dir.toString
    graft.Fs.deleteRecursively(dir)
    writeMediaIndexBase(s, d, dir.toString)
    appendMediaIndexDelta(s, d, dir.toString)
    graft.FixtureStamp.complete(marker, stamp)
    dir.toString
  }

  /** Probe top-k over an arbitrary (neighbor_id, phi, band, bkey) index
    * relation — the ONE search plan every persisted-index variant
    * (batch LSM, stream log, compacted base, post-forget store) shares:
    * hash the bounded probe set, shuffle-hash equi-join on (band, bkey),
    * exact Hamming, per-probe rank. */
  private def probeTopK(s: SparkSession, d: String, ibands: DataFrame)
      : DataFrame = {
    import s.implicits._
    val (_, probes) = searchCorpus(s, d)
    val cand = phBands(phSig(probes))
      .toDF("probe_id", "php", "band", "bkey")
      .hint("shuffle_hash")
      .join(ibands, Seq("band", "bkey"))
      .select($"probe_id", $"neighbor_id",
        bit_count($"php".bitwiseXOR($"phi")).cast("long").as("hamming"))
      .distinct()
    topKFrom(cand)
  }

  private def indexRead(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(dir)
      .select($"media_id".as("neighbor_id"), $"ph".as("phi"),
        $"band", $"bkey")
  }

  /** Search over the persisted index: probe hashes (bounded) against
    * the index read — no corpus re-hash anywhere in the plan. */
  private[graft] def mediaTopKIndexed(s: SparkSession, d: String)
      : DataFrame =
    probeTopK(s, d, indexRead(s, mediaIndexDir(s, d)))

  // ---------- RTBF propagation into the serving index (r14; rewrite
  // r16). Forgetting a doc from the training shards (q_shard_forget) is
  // not enough: its SIGNATURES still sit in the search index and keep
  // surfacing it — the compliance requirement is that a delete
  // propagates to every derived artifact. Generation alignment gives
  // the same bounded blast radius here as in the shard store: a media
  // id's index rows live in exactly ONE generation, derivable from the
  // id alone (the HoldoutMod layout rule), so only the generations the
  // delete set touches rewrite. The rewrite itself is the shared
  // filter-in-place engine ([[IndexForget]]): the artifact's current
  // rows minus the delete set — NOT a re-derivation from the source,
  // which until r16 silently resurrected earlier deletes on the second
  // forget (the works-once class the periodic-lifecycle harness pins).
  private[graft] def forgetMediaIndex(s: SparkSession, d: String,
      dir: String, deletePred: org.apache.spark.sql.Column): Unit = {
    import s.implicits._
    val lay = GenerationLayout.MediaIndex
    val media = Tables.documents(s, d).filter(lay.slice($"doc_id"))
    // affected generations from the layout rule — no index scan
    val affected = media.filter(deletePred)
      .select(lay.genOfInt($"doc_id").as("gen"))
      .distinct().as[Int].collect().toSeq.sorted
    IndexForget.filterInPlace(s, dir, "media_id",
      Seq("media_id", "ph", "band", "bkey"), affected,
      media.filter(deletePred).select($"doc_id".as("media_id")))
  }

  private val mediaIndexForget = QueryDef(
    "q_media_index_forget",
    (s, d) => {
      import s.implicits._
      val dir = graft.streaming.StreamingOps
        .indexArtifactDir("media_band_index_forget", d).toString
      buildMediaIndexStore(s, d, dir) // one encode+hash pass (r16)
      forgetMediaIndex(s, d, dir,
        col("doc_id") % ShardOps.ForgetMod === ShardOps.ForgetRes)
      probeTopK(s, d, indexRead(s, dir)).orderBy($"probe_id", $"rnk")
    },
    Some(s"""WITH ${searchCtesWith(
        s"AND NOT doc_id % ${ShardOps.ForgetMod} = ${ShardOps.ForgetRes}")}
      SELECT CAST(probe_id AS BIGINT) AS probe_id,
        CAST(row_number() OVER (PARTITION BY probe_id
          ORDER BY hamming, neighbor_id) AS BIGINT) AS rnk,
        CAST(neighbor_id AS BIGINT) AS neighbor_id, hamming
      FROM shm QUALIFY rnk <= $TopK ORDER BY probe_id, rnk"""),
    "RTBF propagation into the serving index: affected generations " +
      "filtered IN PLACE (current artifact rows minus the delete set — " +
      "survivors byte-carried, nothing re-hashed, repeated forgets " +
      "compose) and swapped via dynamic partition overwrite; " +
      "post-forget search hash-equal to the oracle's replay with " +
      "deleted docs excluded from the searchable side")

  // ---------- STREAM-maintained media band index (r14, the literal
  // q_stream_media_index the r13 verdict named). The batch LSM build
  // above covers the daily shape; a serving index is really maintained
  // by the INGEST STREAM: each arriving micro-batch of documents
  // derives its media payloads, hashes them, and appends its
  // (media_id, ph, band, bkey, gen=batchId) signature DELTA to the
  // index log — the q_stream_index_maintain posture with band rows
  // instead of postings. No streaming-engine state; a replayed
  // at-least-once batch re-appends byte-identical rows and the search
  // read's distinct collapses them (each media id is admitted by
  // exactly one batch). Search = the persisted-index plan over the
  // stream-maintained log; the declared result is identical to
  // q_simsearch_media, so the SAME full pixel-replay oracle checks the
  // entire stream → hash → band → log → search chain.
  private[graft] def streamMediaIndexBatch(batch: Dataset[Row],
      batchId: Long, out: String): Unit = {
    val s2 = batch.sparkSession
    import s2.implicits._
    val media = batch
      .filter($"doc_id" % 2 === 0)
      .select($"doc_id", encode($"text", "UTF-8").as("tb"))
      .as[(Long, Array[Byte])]
      .map { case (id, tb) => (id, MediaCodec.encodeBmp(id, tb)) }
      .toDF("media_id", "payload")
    bandRows(media).withColumn("gen", lit(batchId))
      .write.mode("append").parquet(out)
  }

  private[graft] def streamMediaIndexLog(s: SparkSession, d: String)
      : String = {
    import s.implicits._
    val dir = graft.streaming.StreamingOps.streamPipeDir(s, d)
    val outPath = graft.streaming.StreamingOps
      .indexArtifactDir("stream_media_band_index", d)
    val marker = outPath.resolve("_complete")
    val stamp = graft.FixtureStamp.stamp("v1", d, "documents")
    if (graft.FixtureStamp.upToDate(marker, stamp)) return outPath.toString
    graft.Fs.deleteRecursively(outPath)
    val out = outPath.toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    graft.streaming.StreamingOps.withStreamPartitions(s,
      graft.streaming.StreamingOps.streamPartitionsFor(dir)) { ss =>
      val q = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(dir)
        .writeStream
        .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
          streamMediaIndexBatch(batch, batchId, out)
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }
    graft.FixtureStamp.complete(marker, stamp)
    out
  }

  private val mediaSearchStreamIndexed = QueryDef(
    "q_stream_media_index",
    (s, d) => {
      import s.implicits._
      val log = streamMediaIndexLog(s, d)
      // replay-duplicate collapse: identical re-appended rows fold away
      probeTopK(s, d, indexRead(s, log).distinct())
        .orderBy($"probe_id", $"rnk")
    },
    Some(searchOracleSql),
    "Perceptual top-k search over the STREAM-maintained band index: " +
      "each micro-batch appends its media signature delta to the index " +
      "log (no streaming-engine state; replays collapse under the " +
      "distinct read); same full pixel-replay hash oracle — the whole " +
      "stream->hash->band->log->search chain under one hash")

  // The compact half of the maintain/compact pair: after many
  // micro-batches the stream log is one file set per (batch × writer
  // partition) — serving reads amplify. Fold it into a single-
  // generation base: the distinct signature rows (the same collapse the
  // search read applies, so an at-least-once replay can never survive
  // compaction), coalesced to a small file set (the q_sink_compaction
  // layout rule). Search over the compacted base is the same declared
  // result — one more full-hash replay of the whole chain.
  private val mediaSearchStreamCompacted = QueryDef(
    "q_stream_media_index_compact",
    (s, d) => {
      import s.implicits._
      val log = streamMediaIndexLog(s, d)
      val basePath = graft.streaming.StreamingOps
        .indexArtifactDir("stream_media_band_base", d)
      s.read.parquet(log)
        .select($"media_id", $"ph", $"band", $"bkey")
        .distinct()
        .coalesce(1)
        .write.mode("overwrite").parquet(basePath.toString)
      probeTopK(s, d, indexRead(s, basePath.toString))
        .orderBy($"probe_id", $"rnk")
    },
    Some(searchOracleSql),
    "Stream-index compaction: the multi-generation signature log folded " +
      "into a single-file base (exactly-once distinct collapse, " +
      "q_sink_compaction layout rule); search over the compacted base " +
      "under the same full pixel-replay hash oracle")

  private val mediaSearchIndexed = QueryDef(
    "q_simsearch_media_index",
    (s, d) => {
      import s.implicits._
      mediaTopKIndexed(s, d).orderBy($"probe_id", $"rnk")
    },
    Some(searchOracleSql),
    "Perceptual top-k search over the PERSISTED band-signature index " +
      "(LSM base + incremental delta generation, maintain pass hashes " +
      "only the delta): probe hashes join the index read — the corpus " +
      "is never re-hashed; same full pixel-replay hash oracle as " +
      "q_simsearch_media")

  private val mediaSearchAudit = QueryDef(
    "q_simsearch_media_audit",
    (s, d) => {
      import s.implicits._
      // signatures and the candidate stream are built ONCE and shared
      // by the banded top-k, the self-recall pin, and the brute force —
      // not recomputed per consumer (each rebuild re-encodes and
      // re-hashes the whole corpus)
      val (idx, probes) = searchCorpus(s, d)
      val isig = phSig(idx).cache()
      val psig = phSig(probes).cache()
      val cand = candFrom(psig, isig).cache()
      val banded = topKFrom(cand).cache()
      // brute-force ground truth: probe hashes broadcast against the
      // index (exact re-score shape — audit-only, probe-bounded)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"probe_id").orderBy($"hamming", $"neighbor_id")
      val brute = isig.toDF("neighbor_id", "phi")
        .crossJoin(broadcast(psig.toDF("probe_id", "php")))
        .select($"probe_id", $"neighbor_id",
          bit_count($"php".bitwiseXOR($"phi")).cast("long").as("hamming"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter($"rnk" <= TopK)
        .select($"probe_id", $"neighbor_id")
      val overlap = banded.select($"probe_id", $"neighbor_id")
        .join(brute, Seq("probe_id", "neighbor_id"), "left_semi")
      // structural recall: the half-bright flips live in ONE column (the
      // boundary column), hence in ONE band (column mod 4), so a probe's
      // source shares the other 3 bands and MUST be a candidate —
      // pinned, not probabilistic (see candFrom)
      val selfCand = cand
        .filter($"neighbor_id" === $"probe_id" - ProbeOff)
      psig.agg(count(lit(1)).as("n_probes"))
        .crossJoin(broadcast(isig.agg(count(lit(1)).as("n_index"))))
        .crossJoin(broadcast(brute.agg(count(lit(1)).as("n_truth"))))
        .crossJoin(broadcast(banded.agg(count(lit(1)).as("n_found"))))
        .crossJoin(broadcast(overlap.agg(count(lit(1)).as("n_overlap"))))
        .crossJoin(broadcast(selfCand.agg(count(lit(1)).as("n_self_cand"))))
        .select($"n_probes", $"n_index", $"n_truth", $"n_found", $"n_overlap",
          $"n_self_cand",
          ($"n_self_cand" === $"n_probes").cast("long").as("self_recall_ok"))
    },
    Some(s"""WITH $searchCtes,
      stk AS (SELECT probe_id, neighbor_id FROM (
          SELECT probe_id, neighbor_id, row_number() OVER (
            PARTITION BY probe_id ORDER BY hamming, neighbor_id) AS rnk
          FROM shm) WHERE rnk <= $TopK),
      sbf AS (SELECT probe_id, neighbor_id FROM (
          SELECT x.mid AS probe_id, y.mid AS neighbor_id,
            row_number() OVER (PARTITION BY x.mid ORDER BY
              bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
              + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)),
              y.mid) AS rnk
          FROM (SELECT * FROM sbp WHERE mid >= $ProbeOff) x
          CROSS JOIN (SELECT * FROM sbp WHERE mid < $ProbeOff) y)
        WHERE rnk <= $TopK),
      ovl AS (SELECT s.probe_id FROM stk s JOIN sbf b
        ON s.probe_id = b.probe_id AND s.neighbor_id = b.neighbor_id),
      slf AS (SELECT probe_id FROM shm
        WHERE neighbor_id = probe_id - $ProbeOff)
      SELECT
        CAST((SELECT count(*) FROM sbp WHERE mid >= $ProbeOff) AS BIGINT)
          AS n_probes,
        CAST((SELECT count(*) FROM sbp WHERE mid < $ProbeOff) AS BIGINT)
          AS n_index,
        CAST((SELECT count(*) FROM sbf) AS BIGINT) AS n_truth,
        CAST((SELECT count(*) FROM stk) AS BIGINT) AS n_found,
        CAST((SELECT count(*) FROM ovl) AS BIGINT) AS n_overlap,
        CAST((SELECT count(*) FROM slf) AS BIGINT) AS n_self_cand,
        CAST(CASE WHEN (SELECT count(*) FROM slf)
            = (SELECT count(*) FROM sbp WHERE mid >= $ProbeOff)
          THEN 1 ELSE 0 END AS BIGINT) AS self_recall_ok"""),
    "Media search audit: banded top-k vs brute-force ground truth " +
      "(probe hashes broadcast against the index) — truth size, found " +
      "size, exact overlap, and the STRUCTURAL probe->source recall pin " +
      "(column-band flips confined to the boundary band) all " +
      "oracle-recomputed by full replay")

  // ------------------------------------------------ audio near-dup
  // The WAV half of the multimodal dedup family (q_dedup_media covers
  // BMP): temporal fingerprint (functions/AudioHash.scala — 65 probe
  // points over the decoded PCM stream, one bit per adjacent-sample
  // comparison, the dHash construction moved to the time axis), banded
  // 4×16 bits, candidates exact-verified on the container-stripped
  // sample stream. The planted corpus has byte-identical copies (found
  // with exact_sample=1) and DC-offset variants (+64 per sample: sample
  // bytes differ, every adjacent comparison — and so the fingerprint —
  // provably preserved → found at hamming 0 with exact_sample=0, the
  // case a byte-hash dedup structurally misses). Generator-formula WAVs
  // mean DuckDB replays the ENTIRE path — samples, probe points, hash
  // bits, band collisions, Hamming, stream equality — so this near-dup
  // query gets a full hash oracle too.
  //
  // Scale posture: hash is a per-row codegen'd kernel over a bounded
  // byte region; candidates come from the banded groupBy (never
  // all-pairs); the sample-verify joins back only candidate ids with
  // shuffle-hash build discipline (the mediaPairs rule).

  /** DC offset applied to the planted audio variants (adds to every
    * 16-bit sample's low byte; ASCII sample low bytes are ≤ 127, so the
    * add never carries — a true DC shift, not a bit permutation). */
  private[graft] val DcShift = BrightShift

  /** +[[DcShift]] on every sample LOW byte (even data-chunk offsets).
    * Callers must exclude empty-text payloads (their generator data
    * bytes reach 255 and would wrap). */
  private[graft] def dcShift(b: Array[Byte]): Array[Byte] = {
    val g = graft.functions.AudioHash.wavData(b)
    require(g != null, "DC-variant fixtures are well-formed WAVs")
    val out = b.clone()
    var i = g(0); val end = g(0) + g(1)
    while (i < end) { out(i) = (out(i) + DcShift).toByte; i += 2 }
    out
  }

  /** The audio-dedup corpus: every odd doc_id is a base WAV; doc_id%10
    * == 5 adds a byte-identical copy, doc_id%14 == 7 a DC-offset
    * variant (both odd, both encoded with the BASE id so the container
    * params match). */
  private[graft] def dedupAudioCorpus(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d).filter($"doc_id" % 2 === 1)
      .select($"doc_id", encode($"text", "UTF-8").as("tb"))
      .as[(Long, Array[Byte])]
    val base = docs.map { case (id, tb) => (id, MediaCodec.encodeWav(id, tb)) }
    val exact = docs.filter(_._1 % 10 == 5)
      .map { case (id, tb) => (id + ExactOff, MediaCodec.encodeWav(id, tb)) }
    val dc = docs.filter(t => t._1 % 14 == 7 && t._2.nonEmpty)
      .map { case (id, tb) =>
        (id + BrightOff, dcShift(MediaCodec.encodeWav(id, tb))) }
    base.union(exact).union(dc).toDF("media_id", "payload")
  }

  /** The audio near-dup pair set (also the audit's subject): banded
    * fingerprint candidates, Hamming ≤ [[MaxHamming]], exact sample
    * byte-verify flag per surviving pair — the mediaPairs plan with the
    * audio kernels. */
  private[graft] def audioPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = dedupAudioCorpus(s, d)
    val sigs = media
      .select($"media_id",
        graft.functions.AudioHash.audiohash64($"payload").as("ph"))
      .filter($"ph".isNotNull)
    val bands = sigs.select(struct($"media_id", $"ph").as("dn"),
      posexplode(array((0 to 3).map(b =>
        shiftrightunsigned($"ph", b * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bkey"))
    val cand = bands.groupBy($"band", $"bkey")
      .agg(sort_array(collect_list($"dn")).as("docs"))
      .select(graft.functions.OrderedPairs.ordered_pairs($"docs")
        .as(Seq("id1", "ph1", "id2", "ph2")))
      .select($"id1", $"id2",
        bit_count($"ph1".bitwiseXOR($"ph2")).cast("int").as("hamming"))
      .distinct()
      .filter($"hamming" <= MaxHamming)
    val smp = media.select($"media_id",
      graft.functions.AudioHash.wav_samples($"payload").as("smp"))
    cand
      .join(smp.toDF("id1", "smp1").hint("shuffle_hash"), "id1")
      .join(smp.toDF("id2", "smp2").hint("shuffle_hash"), "id2")
      .select($"id1", $"id2", $"hamming",
        ($"smp1" === $"smp2").cast("long").as("exact_sample"))
      .orderBy($"id1", $"id2")
  }

  /** Shared oracle CTE block: DuckDB replays the PCM data bytes from
    * the generator formulas (cyclic text fill; +DcShift on low bytes
    * for the DC rows), the 65 probe samples (signed LE 16-bit at
    * floor-divided indices), the 64 hash bits, 4×16-bit band values,
    * band-collision candidates, and per-pair Hamming (via per-band XOR
    * popcounts) + sample-stream equality — the whole path bit-for-bit. */
  private def audioCtes: String = s"""am AS (
      SELECT doc_id AS mid, doc_id AS gid, 0 AS dc, text
      FROM documents WHERE doc_id % 2 = 1
      UNION ALL
      SELECT doc_id + $ExactOff, doc_id, 0, text
      FROM documents WHERE doc_id % 10 = 5
      UNION ALL
      SELECT doc_id + $BrightOff, doc_id, $DcShift, text
      FROM documents WHERE doc_id % 14 = 7 AND length(text) > 0),
    ag AS (
      SELECT mid, dc, text,
        (length(text) % 256 + 16)
          * (CASE WHEN gid % 4 = 1 THEN 1 ELSE 2 END) AS n,
        CAST(length(text) AS BIGINT) AS len
      FROM am),
    apx AS MATERIALIZED (
      SELECT mid, n,
        list_transform(range(0, 2 * n), i ->
          (CASE WHEN len = 0 THEN i % 256
            ELSE CAST(ord(substring(text, CAST(i % len AS INT) + 1, 1))
              AS BIGINT) END)
          + CASE WHEN i % 2 = 0 THEN dc ELSE 0 END) AS dat
      FROM ag),
    apr AS (
      SELECT mid, n,
        list_transform(range(0, 65), k ->
          dat[CAST(2 * ((k * n) // 65) AS INT) + 1]
          + 256 * dat[CAST(2 * ((k * n) // 65) AS INT) + 2]
          - CASE WHEN dat[CAST(2 * ((k * n) // 65) AS INT) + 2] >= 128
              THEN 65536 ELSE 0 END) AS probe
      FROM apx),
    abt AS MATERIALIZED (
      SELECT mid,
        list_transform(range(0, 64), k ->
          CASE WHEN probe[CAST(k AS INT) + 2] > probe[CAST(k AS INT) + 1]
            THEN 1 ELSE 0 END) AS bits
      FROM apr),
    abk AS (
      SELECT mid, band,
        CAST(list_sum(list_transform(range(0, 16), i ->
          bits[CAST(band * 16 + i AS INT) + 1] * (1 << CAST(i AS INT))))
          AS BIGINT) AS bkey
      FROM (SELECT mid, bits, unnest(range(0, 4)) AS band FROM abt)),
    abp AS MATERIALIZED (
      SELECT mid,
        max(CASE WHEN band = 0 THEN bkey END) AS b0,
        max(CASE WHEN band = 1 THEN bkey END) AS b1,
        max(CASE WHEN band = 2 THEN bkey END) AS b2,
        max(CASE WHEN band = 3 THEN bkey END) AS b3
      FROM abk GROUP BY mid),
    acand AS (
      SELECT DISTINCT a.mid AS id1, b.mid AS id2
      FROM abk a JOIN abk b
        ON a.band = b.band AND a.bkey = b.bkey AND a.mid < b.mid),
    afp AS MATERIALIZED (
      SELECT c.id1, c.id2,
        CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
           + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
          AS INT) AS hamming,
        CAST(CASE WHEN p.dat = q.dat THEN 1 ELSE 0 END AS BIGINT)
          AS exact_sample
      FROM acand c JOIN abp x ON c.id1 = x.mid JOIN abp y ON c.id2 = y.mid
        JOIN apx p ON c.id1 = p.mid JOIN apx q ON c.id2 = q.mid)"""

  private val audioDedup = QueryDef(
    "q_dedup_audio",
    (s, d) => audioPairs(s, d),
    Some(s"""WITH $audioCtes
      SELECT id1, id2, hamming, exact_sample FROM afp
      WHERE hamming <= $MaxHamming ORDER BY id1, id2"""),
    "Temporal-fingerprint banded near-dup over decoded WAV samples, " +
      "exact sample byte-verify per pair; DuckDB replays the full path " +
      "from the generator formulas — full hash oracle")

  private val audioDedupAudit = QueryDef(
    "q_dedup_audio_audit",
    (s, d) => {
      import s.implicits._
      val media = dedupAudioCorpus(s, d)
      val smp = media.select($"media_id",
        graft.functions.AudioHash.wav_samples($"payload").as("smp"))
      // ground truth discovered INDEPENDENTLY of the fingerprint path:
      // xxhash64 buckets over the sample stream, full byte verify inside
      val pk = smp.select($"media_id", xxhash64($"smp").as("pk"))
      val gtCand = pk.select(struct($"media_id", $"pk").as("dn"), $"pk")
        .groupBy($"pk").agg(sort_array(collect_list($"dn")).as("docs"))
        .select(graft.functions.OrderedPairs.ordered_pairs($"docs")
          .as(Seq("id1", "k1", "id2", "k2")))
        .select($"id1", $"id2")
      val gt = gtCand
        .join(smp.toDF("id1", "smp1").hint("shuffle_hash"), "id1")
        .join(smp.toDF("id2", "smp2").hint("shuffle_hash"), "id2")
        .filter($"smp1" === $"smp2")
        .select($"id1", $"id2")
      val found = audioPairs(s, d).cache()
      val missed = gt.join(found.select($"id1", $"id2"),
        Seq("id1", "id2"), "left_anti")
      val dc = Tables.documents(s, d)
        .filter($"doc_id" % 14 === 7 && length($"text") > 0)
        .select($"doc_id".as("id1"), ($"doc_id" + BrightOff).as("id2"))
      val dcFound = dc.join(found.filter($"hamming" === 0),
        Seq("id1", "id2"), "left_semi")
      media.agg(count(lit(1)).as("n_media"))
        .crossJoin(broadcast(gt.agg(count(lit(1)).as("n_exact_pairs"))))
        .crossJoin(broadcast(found.agg(count(lit(1)).as("n_found_pairs"))))
        .crossJoin(broadcast(missed.agg(count(lit(1)).as("n_missed"))))
        .crossJoin(broadcast(dc.agg(count(lit(1)).as("n_dc_planted"))))
        .crossJoin(broadcast(dcFound.agg(count(lit(1)).as("n_dc_found"))))
        .select($"n_media", $"n_exact_pairs", $"n_found_pairs", $"n_missed",
          ($"n_missed" === 0L).cast("long").as("recall_ok"),
          $"n_dc_planted", $"n_dc_found")
    },
    Some(s"""WITH $audioCtes,
      agt AS (
        SELECT a.mid AS id1, b.mid AS id2
        FROM apx a JOIN apx b ON a.dat = b.dat AND a.mid < b.mid),
      afnd AS (SELECT id1, id2 FROM afp WHERE hamming <= $MaxHamming),
      amsd AS (
        SELECT g.id1 FROM agt g LEFT JOIN afnd f
          ON g.id1 = f.id1 AND g.id2 = f.id2
        WHERE f.id1 IS NULL),
      adc AS (
        SELECT doc_id AS id1, doc_id + $BrightOff AS id2
        FROM documents WHERE doc_id % 14 = 7 AND length(text) > 0),
      adf AS (
        SELECT d.id1 FROM adc d JOIN afp f
          ON d.id1 = f.id1 AND d.id2 = f.id2 AND f.hamming = 0)
      SELECT
        CAST((SELECT count(*) FROM am) AS BIGINT) AS n_media,
        CAST((SELECT count(*) FROM agt) AS BIGINT) AS n_exact_pairs,
        CAST((SELECT count(*) FROM afnd) AS BIGINT) AS n_found_pairs,
        CAST((SELECT count(*) FROM amsd) AS BIGINT) AS n_missed,
        CAST(CASE WHEN (SELECT count(*) FROM amsd) = 0 THEN 1 ELSE 0 END
          AS BIGINT) AS recall_ok,
        CAST((SELECT count(*) FROM adc) AS BIGINT) AS n_dc_planted,
        CAST((SELECT count(*) FROM adf) AS BIGINT) AS n_dc_found"""),
    "Audio near-dup audit: exact sample-duplicate ground truth (sample-" +
      "hash buckets + byte verify, independent of the fingerprint path) " +
      "must be fully recalled (identical streams => identical bands — " +
      "structural); planted DC variants must land at Hamming 0 — every " +
      "scalar oracle-recomputed by full replay")

  // ------------------------------------------- audio similarity search
  // Completes the modality matrix (image/audio × dedup/search): top-k
  // nearest WAVs by fingerprint Hamming for a bounded probe set. Probes
  // are VOLUME-HALVED variants (every sample s → s/2, floor): halving
  // preserves s_a > s_b except where the halves collide (|s_a − s_b| = 1
  // boundaries), so probe→source distances land small-but-nonzero and
  // graded by content — the realistic "same recording, different gain"
  // query. Bits only flip 1→0 under halving (a > b ⇒ a/2 ≥ b/2), so
  // hamming ≤ popcount(source hash); with 4×16 contiguous bands a probe
  // at hamming ≤ 3 finds its source by pigeonhole — the audit reports
  // (not pins) how the fixture lands. Full DuckDB replay as everywhere
  // in this family: the sample transform is integer floor-halving of
  // the generator formula's nonneg samples.
  //
  // Scale posture: identical to q_simsearch_media — codegen hash,
  // (band, bkey) equi-join with the bounded probe side as shuffle-hash
  // build, per-probe ranking window; brute force only in the audit.

  /** Volume halving: every 16-bit sample s → s/2 (floor; fixture
    * samples are non-negative — ASCII high bytes ≤ 127). */
  private[graft] def halfVolume(b: Array[Byte]): Array[Byte] = {
    val g = graft.functions.AudioHash.wavData(b)
    require(g != null, "volume-variant fixtures are well-formed WAVs")
    val out = b.clone()
    var i = g(0); val end = g(0) + g(1)
    while (i + 1 < end) {
      val s = ((out(i) & 0xff) | ((out(i + 1) & 0xff) << 8)).toShort / 2
      out(i) = (s & 0xff).toByte
      out(i + 1) = ((s >> 8) & 0xff).toByte
      i += 2
    }
    out
  }

  /** (index, probes) for the audio search corpus: index = every base
    * WAV; probes = volume-halved variants of doc_id % 6 == 3 (all odd →
    * WAVs), empty-text docs excluded (their generator samples go
    * negative, where floor-vs-truncate halving diverges). */
  private[graft] def audioSearchCorpus(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    import s.implicits._
    val docs = Tables.documents(s, d).filter($"doc_id" % 2 === 1)
      .select($"doc_id", encode($"text", "UTF-8").as("tb"))
      .as[(Long, Array[Byte])]
    val idx = docs.map { case (id, tb) => (id, MediaCodec.encodeWav(id, tb)) }
      .toDF("media_id", "payload")
    val probes = docs.filter(t => t._1 % 6 == 3 && t._2.nonEmpty)
      .map { case (id, tb) =>
        (id + ProbeOff, halfVolume(MediaCodec.encodeWav(id, tb))) }
      .toDF("media_id", "payload")
    (idx, probes)
  }

  private def ahSig(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select($"media_id",
      graft.functions.AudioHash.audiohash64($"payload").as("ph"))
      .filter($"ph".isNotNull)
  }

  /** 4×16-bit contiguous band explode (the audio-dedup banding). */
  private def ahBands(sigs: DataFrame): DataFrame = {
    import sigs.sparkSession.implicits._
    sigs.select($"media_id", $"ph",
      posexplode(array((0 to 3).map(b =>
        shiftrightunsigned($"ph", b * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bkey"))
  }

  private def audioCandFrom(psig: DataFrame, isig: DataFrame): DataFrame = {
    import psig.sparkSession.implicits._
    ahBands(psig).toDF("probe_id", "php", "band", "bkey")
      .hint("shuffle_hash")
      .join(ahBands(isig).toDF("neighbor_id", "phi", "band", "bkey"),
        Seq("band", "bkey"))
      .select($"probe_id", $"neighbor_id",
        bit_count($"php".bitwiseXOR($"phi")).cast("long").as("hamming"))
      .distinct()
  }

  private[graft] def audioCand(s: SparkSession, d: String): DataFrame = {
    val (idx, probes) = audioSearchCorpus(s, d)
    audioCandFrom(ahSig(probes), ahSig(idx))
  }

  private[graft] def audioTopK(s: SparkSession, d: String): DataFrame =
    topKFrom(audioCand(s, d))

  /** Oracle CTE chain: generator samples (floor-halved for probes) →
    * 65 probes → bits → contiguous 16-bit bands (unpivoted + pivoted) →
    * banded candidates + per-band XOR popcount Hamming. */
  private def audioSearchCtes: String = audioSearchCtesWith("")

  /** `idxExtra` appends a predicate to the INDEX branch only — see
    * [[searchCtesWith]]. */
  private def audioSearchCtesWith(idxExtra: String): String = s"""vm AS (
      SELECT doc_id AS mid, doc_id AS gid, 0 AS halfvol, text
      FROM documents WHERE doc_id % 2 = 1 $idxExtra
      UNION ALL
      SELECT doc_id + $ProbeOff, doc_id, 1, text
      FROM documents WHERE doc_id % 6 = 3 AND length(text) > 0),
    vg AS (
      SELECT mid, halfvol, text,
        (length(text) % 256 + 16)
          * (CASE WHEN gid % 4 = 1 THEN 1 ELSE 2 END) AS n,
        CAST(length(text) AS BIGINT) AS len
      FROM vm),
    vlh AS MATERIALIZED (
      SELECT mid, halfvol,
        list_transform(range(0, 65), k ->
          CASE WHEN len = 0
            THEN CAST((2 * ((k * n) // 65)) % 256 AS BIGINT)
            ELSE CAST(ord(substring(text,
              CAST((2 * ((k * n) // 65)) % len AS INT) + 1, 1)) AS BIGINT)
          END) AS lo,
        list_transform(range(0, 65), k ->
          CASE WHEN len = 0
            THEN CAST((2 * ((k * n) // 65) + 1) % 256 AS BIGINT)
            ELSE CAST(ord(substring(text,
              CAST((2 * ((k * n) // 65) + 1) % len AS INT) + 1, 1)) AS BIGINT)
          END) AS hi
      FROM vg),
    vpr AS MATERIALIZED (
      SELECT mid,
        list_transform(range(1, 66), j ->
          (lo[CAST(j AS INT)] + 256 * hi[CAST(j AS INT)]
            - CASE WHEN hi[CAST(j AS INT)] >= 128 THEN 65536 ELSE 0 END)
          // (1 + halfvol)) AS probe
      FROM vlh),
    vbt AS MATERIALIZED (
      SELECT mid,
        list_transform(range(0, 64), k ->
          CASE WHEN probe[CAST(k AS INT) + 2] > probe[CAST(k AS INT) + 1]
            THEN 1 ELSE 0 END) AS bits
      FROM vpr),
    vbk AS (
      SELECT mid, band,
        CAST(list_sum(list_transform(range(0, 16), i ->
          bits[CAST(band * 16 + i AS INT) + 1] * (1 << CAST(i AS INT))))
          AS BIGINT) AS bkey
      FROM (SELECT mid, bits, unnest(range(0, 4)) AS band FROM vbt)),
    vbp AS MATERIALIZED (
      SELECT mid,
        max(CASE WHEN band = 0 THEN bkey END) AS b0,
        max(CASE WHEN band = 1 THEN bkey END) AS b1,
        max(CASE WHEN band = 2 THEN bkey END) AS b2,
        max(CASE WHEN band = 3 THEN bkey END) AS b3
      FROM vbk GROUP BY mid),
    vcand AS (
      SELECT DISTINCT p.mid AS probe_id, i.mid AS neighbor_id
      FROM vbk p JOIN vbk i ON p.band = i.band AND p.bkey = i.bkey
      WHERE p.mid >= $ProbeOff AND i.mid < $ProbeOff),
    vhm AS (
      SELECT c.probe_id, c.neighbor_id,
        CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
           + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
          AS BIGINT) AS hamming
      FROM vcand c JOIN vbp x ON c.probe_id = x.mid
        JOIN vbp y ON c.neighbor_id = y.mid)"""

  /** Shared by the per-run audio search and its persisted-index twin
    * (same declared result). */
  private def audioSearchOracleSql: String = s"""WITH $audioSearchCtes
      SELECT CAST(probe_id AS BIGINT) AS probe_id,
        CAST(row_number() OVER (PARTITION BY probe_id
          ORDER BY hamming, neighbor_id) AS BIGINT) AS rnk,
        CAST(neighbor_id AS BIGINT) AS neighbor_id, hamming
      FROM vhm QUALIFY rnk <= $TopK ORDER BY probe_id, rnk"""

  private val audioSearch = QueryDef(
    "q_simsearch_audio",
    (s, d) => {
      import s.implicits._
      audioTopK(s, d).orderBy($"probe_id", $"rnk")
    },
    Some(audioSearchOracleSql),
    "Audio top-k search: banded fingerprint candidates, exact Hamming " +
      "re-rank per probe; probes are volume-halved variants; DuckDB " +
      "replays samples->bits->bands->rank — full hash oracle")

  // ------ persisted audio band index (r14 — the q_simsearch_media_index
  // pattern on the WAV kernels; see that operator's comment for the
  // design: LSM base + delta-only maintain, signatures carried next to
  // band keys, probe-only hashing at search time).
  /** The audio family's base/delta split — the property-tested
    * [[GenerationLayout.AudioIndex]] rule (see its comment for why the
    * plain HoldoutMod rule is vacuous on the odd-id slice: ea3ed50). */
  private[graft] def audioDeltaSel: org.apache.spark.sql.Column =
    GenerationLayout.AudioIndex.isDelta(col("doc_id"))

  private def audioIndexSlice(s: SparkSession, d: String, delta: Boolean,
      keep: org.apache.spark.sql.Column = lit(true)): DataFrame = {
    import s.implicits._
    val lay = GenerationLayout.AudioIndex
    Tables.documents(s, d).filter(lay.slice($"doc_id"))
      .filter(lay.genSlice($"doc_id", delta))
      .filter(keep)
      .select($"doc_id", encode($"text", "UTF-8").as("tb"))
      .as[(Long, Array[Byte])]
      .map { case (id, tb) => (id, MediaCodec.encodeWav(id, tb)) }
      .toDF("media_id", "payload")
  }

  private def audioBandRows(slice: DataFrame): DataFrame =
    ahBands(ahSig(slice)).toDF("media_id", "ph", "band", "bkey")

  private[graft] def writeAudioIndexBase(s: SparkSession, d: String,
      dir: String): Unit =
    audioBandRows(audioIndexSlice(s, d, delta = false))
      .withColumn("gen", lit(0))
      .write.mode("overwrite").partitionBy("gen").parquet(dir)

  private[graft] def appendAudioIndexDelta(s: SparkSession, d: String,
      dir: String): Unit =
    audioBandRows(audioIndexSlice(s, d, delta = true))
      .withColumn("gen", lit(1))
      .write.mode("append").partitionBy("gen").parquet(dir)

  /** One-pass two-generation build for the forget query's SCRATCH store
    * — the audio twin of [[buildMediaIndexStore]] (r16, guide §1.2). */
  private[graft] def buildAudioIndexStore(s: SparkSession, d: String,
      dir: String): Unit = {
    import s.implicits._
    val lay = GenerationLayout.AudioIndex
    val slice = Tables.documents(s, d).filter(lay.slice($"doc_id"))
      .select($"doc_id", encode($"text", "UTF-8").as("tb"))
      .as[(Long, Array[Byte])]
      .map { case (id, tb) => (id, MediaCodec.encodeWav(id, tb)) }
      .toDF("media_id", "payload")
    audioBandRows(slice)
      .withColumn("gen", lay.genOfInt($"media_id"))
      .write.mode("overwrite").partitionBy("gen").parquet(dir)
  }

  private[graft] def audioIndexDir(s: SparkSession, d: String): String = {
    val dir = graft.streaming.StreamingOps
      .indexArtifactDir("audio_band_index", d)
    val marker = dir.resolve("_complete")
    val stamp = graft.FixtureStamp.stamp("v1", d, "documents")
    if (graft.FixtureStamp.upToDate(marker, stamp)) return dir.toString
    graft.Fs.deleteRecursively(dir)
    writeAudioIndexBase(s, d, dir.toString)
    appendAudioIndexDelta(s, d, dir.toString)
    graft.FixtureStamp.complete(marker, stamp)
    dir.toString
  }

  /** Search over the persisted audio index — composed from the ONE
    * audio search plan ([[audioProbeTopK]]) and the shared index read,
    * mirroring [[mediaTopKIndexed]], so the declared search and the
    * forget-path search can never drift (ADVICE r14). */
  private[graft] def audioTopKIndexed(s: SparkSession, d: String)
      : DataFrame =
    audioProbeTopK(s, d, indexRead(s, audioIndexDir(s, d)))

  /** Probe top-k over an arbitrary audio index relation — the audio
    * twin of [[probeTopK]]. */
  private def audioProbeTopK(s: SparkSession, d: String, ibands: DataFrame)
      : DataFrame = {
    import s.implicits._
    val (_, probes) = audioSearchCorpus(s, d)
    val cand = ahBands(ahSig(probes))
      .toDF("probe_id", "php", "band", "bkey")
      .hint("shuffle_hash")
      .join(ibands, Seq("band", "bkey"))
      .select($"probe_id", $"neighbor_id",
        bit_count($"php".bitwiseXOR($"phi")).cast("long").as("hamming"))
      .distinct()
    topKFrom(cand)
  }

  // RTBF propagation into the audio index — a delete must reach EVERY
  // derived artifact, and the WAV fingerprints are one (see
  // q_media_index_forget: blast radius from the layout rule, rewrite =
  // the shared filter-in-place engine — the artifact's current rows
  // minus the delete set, so repeated forgets compose; r16).
  private[graft] def forgetAudioIndex(s: SparkSession, d: String,
      dir: String, deletePred: org.apache.spark.sql.Column): Unit = {
    import s.implicits._
    val lay = GenerationLayout.AudioIndex
    val media = Tables.documents(s, d).filter(lay.slice($"doc_id"))
    val affected = media.filter(deletePred)
      .select(lay.genOfInt($"doc_id").as("gen"))
      .distinct().as[Int].collect().toSeq.sorted
    IndexForget.filterInPlace(s, dir, "media_id",
      Seq("media_id", "ph", "band", "bkey"), affected,
      media.filter(deletePred).select($"doc_id".as("media_id")))
  }

  private val audioIndexForget = QueryDef(
    "q_audio_index_forget",
    (s, d) => {
      import s.implicits._
      val dir = graft.streaming.StreamingOps
        .indexArtifactDir("audio_band_index_forget", d).toString
      buildAudioIndexStore(s, d, dir) // one encode+fingerprint pass (r16)
      forgetAudioIndex(s, d, dir,
        col("doc_id") % ShardOps.ForgetMod === ShardOps.ForgetRes)
      audioProbeTopK(s, d, indexRead(s, dir)).orderBy($"probe_id", $"rnk")
    },
    Some(s"""WITH ${audioSearchCtesWith(
        s"AND NOT doc_id % ${ShardOps.ForgetMod} = ${ShardOps.ForgetRes}")}
      SELECT CAST(probe_id AS BIGINT) AS probe_id,
        CAST(row_number() OVER (PARTITION BY probe_id
          ORDER BY hamming, neighbor_id) AS BIGINT) AS rnk,
        CAST(neighbor_id AS BIGINT) AS neighbor_id, hamming
      FROM vhm QUALIFY rnk <= $TopK ORDER BY probe_id, rnk"""),
    "RTBF propagation into the audio fingerprint index: affected " +
      "generations filtered in place (current rows minus the delete " +
      "set; repeated forgets compose) and swapped via dynamic " +
      "partition overwrite; post-forget search hash-equal to the " +
      "replay with deleted docs excluded from the searchable side")

  private val audioSearchIndexed = QueryDef(
    "q_simsearch_audio_index",
    (s, d) => {
      import s.implicits._
      audioTopKIndexed(s, d).orderBy($"probe_id", $"rnk")
    },
    Some(audioSearchOracleSql),
    "Audio top-k search over the PERSISTED fingerprint band index (LSM " +
      "base + incremental delta, maintain hashes only the delta slice): " +
      "probe hashes join the index read — the corpus is never re-hashed " +
      "at search time; same full sample-replay hash oracle as " +
      "q_simsearch_audio")

  private val audioSearchAudit = QueryDef(
    "q_simsearch_audio_audit",
    (s, d) => {
      import s.implicits._
      val (idx, probes) = audioSearchCorpus(s, d)
      val isig = ahSig(idx).cache()
      val psig = ahSig(probes).cache()
      val cand = audioCandFrom(psig, isig).cache()
      val banded = topKFrom(cand).cache()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"probe_id").orderBy($"hamming", $"neighbor_id")
      val brute = isig.toDF("neighbor_id", "phi")
        .crossJoin(broadcast(psig.toDF("probe_id", "php")))
        .select($"probe_id", $"neighbor_id",
          bit_count($"php".bitwiseXOR($"phi")).cast("long").as("hamming"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter($"rnk" <= TopK)
        .select($"probe_id", $"neighbor_id")
      val overlap = banded.select($"probe_id", $"neighbor_id")
        .join(brute, Seq("probe_id", "neighbor_id"), "left_semi")
      // how the pigeonhole landed on THIS corpus (reported, not pinned:
      // halving's flip count is content-dependent)
      val selfCand = cand
        .filter($"neighbor_id" === $"probe_id" - ProbeOff)
      psig.agg(count(lit(1)).as("n_probes"))
        .crossJoin(broadcast(isig.agg(count(lit(1)).as("n_index"))))
        .crossJoin(broadcast(brute.agg(count(lit(1)).as("n_truth"))))
        .crossJoin(broadcast(banded.agg(count(lit(1)).as("n_found"))))
        .crossJoin(broadcast(overlap.agg(count(lit(1)).as("n_overlap"))))
        .crossJoin(broadcast(selfCand.agg(count(lit(1)).as("n_self_cand"))))
        .select($"n_probes", $"n_index", $"n_truth", $"n_found",
          $"n_overlap", $"n_self_cand")
    },
    Some(s"""WITH $audioSearchCtes,
      vtk AS (SELECT probe_id, neighbor_id FROM (
          SELECT probe_id, neighbor_id, row_number() OVER (
            PARTITION BY probe_id ORDER BY hamming, neighbor_id) AS rnk
          FROM vhm) WHERE rnk <= $TopK),
      vbf AS (SELECT probe_id, neighbor_id FROM (
          SELECT x.mid AS probe_id, y.mid AS neighbor_id,
            row_number() OVER (PARTITION BY x.mid ORDER BY
              bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
              + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)),
              y.mid) AS rnk
          FROM (SELECT * FROM vbp WHERE mid >= $ProbeOff) x
          CROSS JOIN (SELECT * FROM vbp WHERE mid < $ProbeOff) y)
        WHERE rnk <= $TopK),
      vov AS (SELECT s.probe_id FROM vtk s JOIN vbf b
        ON s.probe_id = b.probe_id AND s.neighbor_id = b.neighbor_id),
      vsl AS (SELECT probe_id FROM vhm
        WHERE neighbor_id = probe_id - $ProbeOff)
      SELECT
        CAST((SELECT count(*) FROM vbp WHERE mid >= $ProbeOff) AS BIGINT)
          AS n_probes,
        CAST((SELECT count(*) FROM vbp WHERE mid < $ProbeOff) AS BIGINT)
          AS n_index,
        CAST((SELECT count(*) FROM vbf) AS BIGINT) AS n_truth,
        CAST((SELECT count(*) FROM vtk) AS BIGINT) AS n_found,
        CAST((SELECT count(*) FROM vov) AS BIGINT) AS n_overlap,
        CAST((SELECT count(*) FROM vsl) AS BIGINT) AS n_self_cand"""),
    "Audio search audit: banded top-k vs brute-force ground truth " +
      "(probe hashes broadcast against the index), self-candidacy " +
      "reported — every scalar oracle-recomputed by full replay")

  override def defs: Seq[QueryDef] =
    Seq(multimodalMeta, multimodalFeatures, multimodalDecode,
      mediaDedup, mediaDedupAudit, mediaSearch, mediaSearchAudit,
      mediaSearchIndexed, mediaSearchStreamIndexed,
      mediaSearchStreamCompacted, mediaIndexForget,
      audioDedup, audioDedupAudit, audioSearch, audioSearchAudit,
      audioSearchIndexed, audioIndexForget)
}
