package graft

import java.nio.file.{Files, Path, Paths}

/** Writable scratch root for runtime-staged artifacts (stream-replay
  * symlink dirs, reader fixtures, metrics dumps). Resolution order:
  *
  *  1. `SPARK_GRAFT_STAGE_DIR` env override (explicit deploys),
  *  2. `<cwd>/target` when present-or-creatable and writable — the
  *     usual sbt-checkout case, keeping artifacts out of /tmp where the
  *     oracle side expects to re-read them across processes,
  *  3. `<java.io.tmpdir>/graft-stage` as the fallback, so the library
  *     still runs from a read-only install dir.
  *
  * Previously some call sites hardcoded the builder checkout's absolute
  * path, which broke any run from a different checkout root.
  */
object Stage {
  lazy val root: Path = {
    val candidates =
      sys.env.get("SPARK_GRAFT_STAGE_DIR").map(Paths.get(_)).toSeq ++
        Seq(Paths.get("target").toAbsolutePath,
          Paths.get(sys.props("java.io.tmpdir"), "graft-stage"))
    candidates.find { p =>
      try { Files.createDirectories(p); Files.isWritable(p) }
      catch { case _: Throwable => false }
    }.getOrElse(Paths.get(sys.props("java.io.tmpdir")))
  }

  /** `<root>/<sub>`, created. */
  def dir(sub: String): Path = {
    val p = root.resolve(sub)
    Files.createDirectories(p)
    p
  }

  /** Absolute path string for a staged file `<root>/<sub>/<name>`
    * (parent created, file itself left to the caller). */
  def path(sub: String, name: String): String =
    dir(sub).resolve(name).toString
}
