package graft

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentHashMap

/** Registry of pid-suffixed scratch directories (bucketed tables,
  * compaction/z-order/JSONL roundtrips, persisted indexes) deleted
  * recursively on JVM exit.
  *
  * Deletion must wait for exit: the queries that write these dirs
  * return LAZY DataFrames that read the files back, and the harness
  * materializes them (parquet dump, bench count) long after the query
  * closure returns. A shutdown hook is the earliest safe point — and
  * it stops orphaned copies accumulating across harness runs, since
  * the pid suffix changes every run.
  */
object TempCleanup {

  private val registered = ConcurrentHashMap.newKeySet[String]()

  @volatile private var hookInstalled = false

  def register(path: String): String = {
    if (!hookInstalled) synchronized {
      if (!hookInstalled) {
        Runtime.getRuntime.addShutdownHook(new Thread(() => deleteAll()))
        hookInstalled = true
      }
    }
    registered.add(path)
    path
  }

  private def deleteAll(): Unit = {
    registered.forEach(p => deleteRecursively(Paths.get(p)))
    registered.clear()
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      if (Files.isDirectory(p) && !Files.isSymbolicLink(p)) {
        val children = Files.list(p)
        try children.forEach(c => deleteRecursively(c))
        finally children.close()
      }
      try Files.deleteIfExists(p)
      catch { case _: java.io.IOException => () } // best-effort on exit
    }
  }
}
