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

  private lazy val sessionRoot: Path = create("graft_session_")

  /** A stable per-name scratch directory, CLEARED on every call:
    * repeated invocations of the same query reuse one directory instead
    * of accumulating a full materialized copy per invocation (the disk
    * analogue of the round-3 memory-sink leak — a 3-rep bench plus
    * warmup would otherwise hold 4 copies of a query's output under
    * /tmp until JVM exit). Callers that hold a lazy DataFrame over the
    * previous contents must consume it before invoking again; that is
    * the same contract an overwritten sink path has. Not safe for
    * concurrent invocations of the same name.
    */
  def scratch(name: String): Path = {
    val p = sessionRoot.resolve(name)
    rm(p.toFile)
    Files.createDirectories(p)
  }

  private lazy val fastRoot: Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (Files.isDirectory(shm) && Files.isWritable(shm)) {
      val p = Files.createTempDirectory(shm, "graft_session_")
      hookInstalled
      dirs.add(p)
      p
    } else sessionRoot
  }

  /** Like [[scratch]] but on tmpfs (/dev/shm) when available — for
    * HARNESS I/O whose cost must not be booked against the operator
    * being measured (round-12 verdict item 7: q197's streaming
    * checkpoint is per-rep metadata churn, ~3 s of fsync-bound disk
    * I/O per bench rep on a slow box, against a ~1 s operator). Same
    * per-name clear-on-call contract and shutdown cleanup as scratch;
    * falls back to the disk scratch root when /dev/shm is absent.
    * Only for small metadata (streaming checkpoints/offsets), never
    * for materialized data: tmpfs is RAM.
    */
  def fastScratch(name: String): Path = {
    val p = fastRoot.resolve(name)
    rm(p.toFile)
    Files.createDirectories(p)
  }
}
