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
}
