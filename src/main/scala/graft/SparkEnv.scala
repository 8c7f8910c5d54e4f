package graft

/** Session-level environment knobs shared by every entry point. */
object SparkEnv {

  /** Directory for Spark shuffle files and spills (`spark.local.dir`).
    *
    * Local mode pins scratch I/O to the fastest local storage available:
    * shuffle blocks are transient and re-creatable (lineage re-runs the
    * stage on loss), so a RAM-backed tmpfs is safe and keeps the benchmark
    * measuring the engine, not the host's block device — on a cluster the
    * same setting would point at executor-local NVMe. Falls back to the
    * JVM temp dir when no tmpfs is present.
    */
  lazy val localDir: String = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) {
      val d = new java.io.File(shm, "graft-spark")
      d.mkdirs()
      d.getAbsolutePath
    } else sys.props.getOrElse("java.io.tmpdir", "/tmp")
  }

  /** Scratch directory for transient test/bench fixtures, on the same
    * fast storage as [[localDir]].
    */
  def scratchDir(prefix: String): String =
    java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(localDir), prefix)
      .toString
}
