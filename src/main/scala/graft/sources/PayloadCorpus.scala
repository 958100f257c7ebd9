package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

/** Deterministic payload landing-zone generator for stress/scenario runs:
  * n single-payload JSON files in the two reference shapes
  * (/root/reference/src/mining/utils/extract.py payload contract;
  * tests/test_transform.py:8-14,30-36), named in monotonically increasing
  * sort order (the PayloadJsonSource offset contract). Files alternate
  * price/hashrate with server timestamps spaced `stepSec` apart, so a
  * corpus of n files spans n*stepSec seconds of 5-minute windows.
  *
  * This simulates the INGEST infrastructure (the reference's aiohttp poll
  * loop writing a landing zone), not the engine — generation is a driver
  * loop because a landing zone is populated by an external producer; the
  * engine only ever lists and reads it.
  */
object PayloadCorpus {

  /** Generate (idempotently, marker-guarded) and return the dir path. */
  def ensure(dirName: String, n: Int,
      t0: Long = 1609459200L, stepSec: Long = 20L): String = {
    val dir = Paths.get("target", dirName).toAbsolutePath
    val marker = dir.resolve(s"_complete_$n")
    if (Files.exists(marker)) return dir.toString
    graft.Fs.deleteRecursively(dir) // stale partial/other-size corpus: rebuild
    Files.createDirectories(dir)
    var i = 0
    while (i < n) {
      val ts = t0 + i * stepSec
      val json =
        if (i % 2 == 0)
          s"""{"spider_ts": $ts, "price_data": {"USD": ${50000 + i % 997}, "time": $ts}}"""
        else
          s"""{"spider_ts": $ts, "hash_rate_data": {"currentHashrate": ${1000 + i}, "currentDifficulty": ${500 + i}}}"""
      Files.write(dir.resolve(f"payload_$i%07d.json"),
        json.getBytes(StandardCharsets.UTF_8))
      i += 1
    }
    Files.write(marker, Array.empty[Byte])
    dir.toString
  }
}
