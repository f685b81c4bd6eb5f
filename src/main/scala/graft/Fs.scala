package graft

/** Tiny local-filesystem helpers shared by the harness mains and the
  * checkpoint manager (one definition, not three copies to keep in
  * sync). */
object Fs {
  /** Recursive delete; does not follow symlinks out of the tree (the
    * symlink itself is removed, its target untouched). Best-effort —
    * missing paths are a no-op. */
  def deleteRecursively(f: java.io.File): Unit = {
    if (!java.nio.file.Files.isSymbolicLink(f.toPath))
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(); ()
  }
}
