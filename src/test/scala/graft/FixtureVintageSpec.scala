package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The driver regenerates /root/testdata between rounds, and `events.ts`
  * has already shipped in two physical vintages (TIMESTAMP(NANOS) read
  * as raw long in rounds 1–7; TIMESTAMP(MICROS, NTZ) since round 8).
  * These tests pin the vintage-normalization contract so the NEXT regen
  * fails loudly here instead of silently skewing event time (the round-7
  * incident: a hand-pinned LongType stream schema read µs as ns and
  * collapsed 31 days of windows into 45 rows). */
class FixtureVintageSpec extends SparkTestBase {

  private val baseUs = 1704067200000000L // 2024-01-01 00:00:00 UTC, µs

  test("normalizeTs: raw-nanos long vintage truncates to µs timestamps") {
    import spark.implicits._
    val ns = Seq(baseUs * 1000L + 1999L, baseUs * 1000L + 999L)
      .toDF("ts") // 1999 ns and 999 ns past the base second
    val out = Tables.normalizeTs(ns)
    assert(out.schema("ts").dataType == TimestampType)
    val us = out.select(unix_micros($"ts")).as[Long].collect().sorted
    assert(us.sameElements(Array(baseUs, baseUs + 1L))) // floor, not round
  }

  test("normalizeTs: µs-NTZ vintage reinterprets (UTC session) without shifting") {
    import spark.implicits._
    val ntz = Seq(baseUs, baseUs + 123456L).toDF("us")
      .select(timestamp_micros($"us").cast(TimestampNTZType).as("ts"))
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    val out = Tables.normalizeTs(ntz)
    assert(out.schema("ts").dataType == TimestampType)
    val us = out.select(unix_micros($"ts")).as[Long].collect().sorted
    assert(us.sameElements(Array(baseUs, baseUs + 123456L)))
  }

  test("normalizeTs: already-normalized vintage is a no-op") {
    import spark.implicits._
    val ltz = Seq(baseUs).toDF("us").select(timestamp_micros($"us").as("ts"))
    val out = Tables.normalizeTs(ltz)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros($"ts")).as[Long].head() == baseUs)
  }

  test("Tables.events normalizes the on-disk corpus to µs TimestampType") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType)
    // sanity: event time spans days, not minutes — the µs-as-ns misread
    // compressed the corpus 1000× (round-7 q_stream_tumbling incident)
    import spark.implicits._
    val (mn, mx) = ev.agg(min(unix_micros($"ts")), max(unix_micros($"ts")))
      .as[(Long, Long)].head()
    assert(mx - mn > 86400L * 1000000L, s"events span ${mx - mn} µs — misread vintage?")
  }

  test("documents.text is pure ASCII — the byte-length/char-length equivalence pin") {
    // The audio fixture arithmetic (dcShift no-carry, halfVolume floor
    // equivalence) and several oracle CTEs equate DuckDB length(text)
    // (chars) with the UTF-8 BYTE length — sound only while the corpus
    // is pure ASCII. The driver regenerates /root/testdata between
    // rounds; if a regeneration introduces any multi-byte character this
    // must fail HERE, loudly, instead of surfacing as a pile of opaque
    // oracle hash mismatches (ADVICE r13).
    import spark.implicits._
    Seq(sf, "/root/testdata/sf0.01").distinct
      .filter(d => new java.io.File(d, "documents.parquet").exists())
      .foreach { d =>
        // pure ASCII ⟺ char length == UTF-8 byte length, per row
        val nonAscii = Tables.documents(spark, d)
          .filter(length($"text") =!= octet_length($"text"))
          .count()
        assert(nonAscii == 0L,
          s"$d/documents has $nonAscii non-ASCII rows — the ASCII corpus " +
            "assumption broke; re-derive the byte-length oracles")
      }
  }

  test("FixtureStamp invalidates on source change and layout version bump") {
    val dir = java.nio.file.Files.createTempDirectory("stampspec")
    val src = dir.resolve("t.parquet")
    java.nio.file.Files.write(src, "abc".getBytes)
    val marker = dir.resolve("_m")
    val s1 = FixtureStamp.stamp("v1", dir.toString, "t")
    assert(!FixtureStamp.upToDate(marker, s1)) // no marker yet
    FixtureStamp.complete(marker, s1)
    assert(FixtureStamp.upToDate(marker, s1))
    // same source, bumped layout version → rebuild
    assert(!FixtureStamp.upToDate(marker, FixtureStamp.stamp("v2", dir.toString, "t")))
    // changed source bytes (size) → rebuild
    java.nio.file.Files.write(src, "abcd".getBytes)
    assert(!FixtureStamp.upToDate(marker, FixtureStamp.stamp("v1", dir.toString, "t")))
  }
}
