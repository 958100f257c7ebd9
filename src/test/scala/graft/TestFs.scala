package graft

/** Shared filesystem assertions for the store specs. */
object TestFs {

  /** Relative-path → CRC32 of every part- file under `root` — the
    * byte-identical-partition assertion primitive every forget/compact
    * spec pins blast radii with (one copy, per the r15 review; a walk
    * fix — e.g. skipping .crc sidecars — lands everywhere at once). */
  def crcByFile(root: java.nio.file.Path): Map[String, Long] = {
    if (!java.nio.file.Files.isDirectory(root)) return Map.empty
    val walk = java.nio.file.Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("part-"))
        .map { p =>
          val crc = new java.util.zip.CRC32()
          crc.update(java.nio.file.Files.readAllBytes(p))
          root.relativize(p).toString -> crc.getValue
        }.toMap
    } finally walk.close()
  }
}
