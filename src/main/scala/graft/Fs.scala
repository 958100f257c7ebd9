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
}
