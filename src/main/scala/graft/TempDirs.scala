package graft

/** JVM-lifetime scratch directories. Every fixture warehouse, index
  * save and stream sink the harness mains (Bench/Verify/Demo) and the
  * specs create lives only for the process — but
  * `Files.createTempDirectory` never cleans up, and a day of bench +
  * verify + ladder runs left 750+ orphaned warehouse dirs (~4 GB of
  * small parquet files) in /tmp, measurably degrading later stream-sink
  * benches on the same machine. `create` is a drop-in replacement that
  * registers each directory for recursive deletion at JVM exit. */
object TempDirs {
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      // per-directory guard: one failing dir (e.g. mutated concurrently
      // by Spark's own shutdown hooks) must not abort the rest
      registered.forEach(p =>
        try deleteRecursively(p)
        catch { case scala.util.control.NonFatal(_) => () })))

  def create(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    hookInstalled
    registered.add(p)
    p
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    try {
      if (java.nio.file.Files.isDirectory(p,
          java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
        val children = java.nio.file.Files.list(p)
        try children.forEach(deleteRecursively(_)) finally children.close()
      }
      java.nio.file.Files.deleteIfExists(p)
      // UncheckedIOException (Files.list streams) and friends are
      // RuntimeExceptions — best effort at exit means swallowing those too
    } catch { case scala.util.control.NonFatal(_) => () }
}
