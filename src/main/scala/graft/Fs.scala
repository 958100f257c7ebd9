package graft

/** Filesystem helpers shared by the artifact-dir builders. */
object Fs {
  /** Recursive delete, children before parents; no-op when absent.
    * Replaces the six inline `Files.walk ... reverse.foreach(delete)`
    * copies (r12 review) — and unlike them, closes the walk stream. */
  def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(p)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }

  /** Recursive copy, parents before children (walk order), replacing
    * existing files — the store-snapshot primitive the forget queries
    * use to work on a copy of a shared pristine store. */
  def copyRecursively(src: java.nio.file.Path,
      dst: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(src)
    try walk.iterator().asScala.foreach { p =>
      val target = dst.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(target)
      else {
        java.nio.file.Files.createDirectories(target.getParent)
        java.nio.file.Files.copy(p, target,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    } finally walk.close()
  }
}
