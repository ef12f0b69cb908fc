package graft

/** Repo-root locator for tests that reference committed-but-gitignored
  * local fixtures (e.g. `localdata/sf1`). CWD-relative paths silently
  * miss in forked test JVMs launched from outside the repo root, turning
  * `assume`-guarded gates into silent skips; anchoring on the compiled
  * classes' location cannot.
  */
object RepoRoot {
  /** The directory containing build.sbt, found by walking up from the
    * test classpath; falls back to the CWD if the walk somehow fails
    * (e.g. classes loaded from a jar outside the repo).
    */
  lazy val dir: java.io.File = {
    val fromClasses =
      try {
        val start = new java.io.File(
          getClass.getProtectionDomain.getCodeSource.getLocation.toURI)
        Iterator.iterate(start)(_.getParentFile)
          .takeWhile(_ != null)
          .find(d => new java.io.File(d, "build.sbt").exists())
      } catch { case _: Exception => None }
    fromClasses.getOrElse(new java.io.File(".").getAbsoluteFile)
  }
}
