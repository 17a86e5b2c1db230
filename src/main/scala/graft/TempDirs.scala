package graft

import java.nio.file.{Files, Path}

/** Session-scoped temp directories with ONE shutdown hook for all of
  * them. Registering a hook per invocation (the obvious
  * `sys.addShutdownHook` at each call site) accumulates hooks without
  * bound on a long-lived session — the same slow-leak class as the
  * round-3 memory-sink temp view. Callers get a fresh directory; the
  * single hook removes every registered dir at JVM exit.
  */
object TempDirs {
  private val dirs = java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()

  private lazy val hookInstalled: Unit = {
    sys.addShutdownHook {
      dirs.forEach(p => rm(p.toFile))
    }
    ()
  }

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
  }

  /** A fresh temp directory deleted at JVM exit. */
  def create(prefix: String): Path = {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    p
  }
}
