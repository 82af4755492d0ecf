package graft.util

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Local-FS helpers for fixture/checkpoint hygiene. Only ever pointed at
  * paths under the repo's own target/fixtures tree.
  */
object Fs {

  /** Delete a directory tree if it exists (no-op otherwise). */
  def deleteRecursively(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p)) {
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    }
  }
}
