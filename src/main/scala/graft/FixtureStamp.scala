package graft

import java.nio.file.{Files, Path}

/** Completion markers for fixtures DERIVED from the driver corpus
  * (stream input dirs, the payload landing zone, the 10× stress replica).
  *
  * A bare "exists" marker is wrong across rounds: the driver regenerates
  * `/root/testdata` between rounds (round 8 changed `events.ts` from
  * TIMESTAMP(NANOS) to µs-NTZ *and* redrew every value), while `target/`
  * persists on the same checkout — so a build-once fixture would keep
  * serving data from the previous corpus and every oracle comparison
  * against the fresh tables would silently mismatch. The marker therefore
  * records the identity (size + mtime per source file) of the tables the
  * fixture was built from, plus a layout version; any corpus regeneration
  * or fixture-format change rebuilds in place.
  */
object FixtureStamp {

  /** Identity of the source parquet files under `sfDir` (single files in
    * the driver corpus; directories — e.g. a replica table — hash their
    * part-file names/sizes). */
  def stamp(version: String, sfDir: String, tables: String*): String = {
    val parts = tables.map { t =>
      val f = new java.io.File(s"$sfDir/$t.parquet")
      val id =
        if (f.isDirectory)
          f.listFiles().map(p => s"${p.getName}=${p.length}").sorted.mkString(",").hashCode.toString
        else s"${f.length}:${f.lastModified}"
      s"$t:$id"
    }
    (version +: parts).mkString("|")
  }

  def upToDate(marker: Path, stamp: String): Boolean =
    Files.exists(marker) &&
      new String(Files.readAllBytes(marker), "UTF-8") == stamp

  def complete(marker: Path, stamp: String): Unit =
    Files.write(marker, stamp.getBytes("UTF-8"))
}
