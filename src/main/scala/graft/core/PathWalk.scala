package graft.core

import java.nio.file.{Files, Path}

/** Closed-by-construction directory traversal: `Files.walk`/`Files.list`
  * return streams backed by open directory handles that survive until
  * GC if not closed — long sessions that repeatedly walk fixture roots
  * (bench lakes, checkpoint reaps, file-count pins) would accumulate fd
  * debt. These wrappers scope the stream to the callback and always
  * close, matching the try/finally pattern ManifestCatalog already uses.
  */
object PathWalk {

  def walk[A](root: Path)(f: Iterator[Path] => A): A = {
    val s = Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      f(s.iterator().asScala)
    } finally s.close()
  }

  def list[A](dir: Path)(f: Iterator[Path] => A): A = {
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      f(s.iterator().asScala)
    } finally s.close()
  }

  /** Depth-first delete of a directory tree, stream closed. */
  def deleteRecursively(root: Path): Unit =
    walk(root)(it => it.toSeq.reverseIterator.foreach(p => Files.deleteIfExists(p)))
}
