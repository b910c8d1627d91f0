package graft.tools

/** The ONE recursive-delete helper (review finding: five identical
  * inline copies had accumulated across main and test sources — a
  * future behavioral fix, e.g. symlink handling, must land in exactly
  * one place).
  */
object Fs {

  /** Delete `f` and everything under it. `listFiles()` returns null
    * on I/O or permission errors; the null-guard keeps cleanup from
    * masking the real failure with an NPE.
    */
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }
}
