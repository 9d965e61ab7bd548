package graft.util

import java.nio.file.{Files, Path, Paths}

/** Fixed per-process scratch directories for query fixtures (r5,
  * ADVICE). `Files.createTempDirectory` per invocation leaked one
  * directory per bench/verify run; a fixed root reused across
  * invocations is idempotent because every writer here either uses
  * Spark's `mode("overwrite")` (which replaces the whole output dir)
  * or writes byte-identical files keyed by stable ids.
  *
  * Local-mode assumption (documented, not hidden): driver and
  * executors share one filesystem, so a `java.io.tmpdir` path is
  * visible to both. On a real cluster these fixtures would live on
  * shared storage (the object store the fixture stands in for).
  */
object Scratch {

  private lazy val root: Path = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_scratch")
    Files.createDirectories(p)
    p
  }

  /** A stable scratch dir, created on first use and reused forever
    * after (same process or a later one). */
  def dir(name: String): String = {
    val p = root.resolve(name)
    Files.createDirectories(p)
    p.toString
  }

  /** A stable scratch dir keyed by an input path, so fixtures derived
    * from different scale factors never collide. */
  def dirFor(name: String, inputPath: String): String =
    dir(name + "_" + java.lang.Integer.toHexString(inputPath.hashCode))

  /** A PER-PROCESS scratch dir (name carries the JVM pid) for
    * fixtures whose write protocol REJECTS concurrent writers — the
    * staged sink's optimistic commit (r12 ADVICE): two harness JVMs
    * sharing the plain dirFor path would make one of them abort
    * loudly on the CAS, so each process gets its own table. Stale
    * siblings left by DEAD pids are swept on first use; liveness is
    * ProcessHandle-based, which shares the q_join_bucketed sweep's
    * documented assumption — single host, single pid namespace
    * (java.io.tmpdir is process-local to this machine by
    * construction, so a cross-host peer can never appear here). */
  def pidDirFor(name: String, inputPath: String): String = {
    val pid = ProcessHandle.current().pid()
    val pat = ("^" + java.util.regex.Pattern.quote(name) + "_p(\\d+)_.*$").r
    Option(root.toFile.listFiles()).getOrElse(Array.empty).foreach { f =>
      f.getName match {
        case pat(p) if p.toLong != pid &&
            !ProcessHandle.of(p.toLong).map[Boolean](_.isAlive).orElse(false) =>
          deleteRecursively(f)
        case _ => ()
      }
    }
    dir(s"${name}_p${pid}_" +
      java.lang.Integer.toHexString(inputPath.hashCode))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }
}
