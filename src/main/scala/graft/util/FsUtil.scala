package graft.util

/** Small filesystem helpers shared by gate queries, probes, and specs. */
object FsUtil {

  /** Best-effort recursive delete of a temp directory (r11: the one
    * implementation — gate queries, probes, and specs all delete their
    * scratch stores through here, so a future hardening lands once). */
  def deleteTree(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.walk(p)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
  }
}
