package graft.queries

import java.nio.file.{Files, Path, Paths}

/** Temp-dir hygiene for the append-chain entries: each invocation
  * mutates a file-level COPY of a cached index, so a fresh scratch
  * dir per run is part of the contract (append idempotency) — but an
  * unmanaged `createTempDirectory` per bench rep accumulates full
  * index copies in /tmp for the life of the JVM. This keeps AT MOST
  * ONE live scratch per prefix: requesting a new one deletes the
  * previous (by then its DataFrame has been fully consumed — entries
  * run to completion before re-invocation), and a shutdown hook
  * sweeps whatever is still live at exit.
  */
object ScratchDirs {
  private val live = scala.collection.mutable.Map.empty[String, Path]

  sys.addShutdownHook {
    ScratchDirs.synchronized { live.values.foreach(deleteRecursively) }
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try {
        s.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
      } finally s.close()
    }

  /** A fresh scratch dir for `prefix`, deleting the prefix's previous
    * scratch first (bounded accumulation: one live copy per prefix).
    */
  def freshAppendScratch(prefix: String): String = synchronized {
    live.remove(prefix).foreach(deleteRecursively)
    val p = Files.createTempDirectory(prefix)
    live(prefix) = p
    p.toString
  }

  /** Recursive copy with the walk stream CLOSED (Files.walk leaks a
    * directory handle per call if the stream is never closed).
    */
  def copyDir(from: String, to: String): Unit = {
    val src = Paths.get(from)
    val s = Files.walk(src)
    try {
      s.forEach { p =>
        val dst = Paths.get(to).resolve(src.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(dst)
        else Files.copy(p, dst)
      }
    } finally s.close()
  }
}
