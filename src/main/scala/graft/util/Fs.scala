package graft.util

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Local-FS helpers for fixture/checkpoint hygiene. Only ever pointed at
  * paths under the repo's own target/fixtures tree.
  */
object Fs {

  /** Materialized directory listing with the stream closed (every
    * java.nio directory stream holds an fd until closed). */
  def listClosed(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.toArray.map(_.asInstanceOf[Path]).toSeq finally s.close()
  }

  /** Materialized recursive walk with the stream closed. */
  def walkClosed(p: Path): Seq[Path] = {
    val s = Files.walk(p)
    try s.toArray.map(_.asInstanceOf[Path]).toSeq finally s.close()
  }

  /** Delete a directory tree if it exists (no-op otherwise). The walk
    * stream is closed explicitly — java.nio directory streams hold an
    * open fd until closed, and per-micro-batch callers (q84's merge)
    * would otherwise leak one per invocation (review r5). */
  def deleteRecursively(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally s.close()
    }
  }
}
