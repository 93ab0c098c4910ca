package graft

/** Per-JVM scratch root for operators that materialize intermediate
  * parquet (streaming foreachBatch partials, staged stream inputs, IVF
  * indexes, partitioned fixture layouts).
  *
  * One temp root per JVM, removed by a shutdown hook. Callers get stable
  * NAMED subdirs instead of a fresh `createTempDirectory` per invocation,
  * so repeated Verify/Bench runs inside one JVM reuse (or explicitly
  * reset) the same location, and nothing is left on disk at exit —
  * the round-5 audit found four call sites each leaking one orphaned
  * temp dir per invocation × 3 bench reps. */
object Scratch {

  private lazy val root: java.nio.file.Path = {
    // Prefer tmpfs for the same reason Sessions points spark.local.dir
    // there: this VM's disk throttles concurrent buffered writes to
    // ~10 MB/s in bursts, so sink-roundtrip queries (ORC/JSON/vacuum)
    // would measure the throttle token bucket, not the engine. Scratch
    // contents are bounded intermediates (≤ a few GB) and are removed at
    // exit either way. Production points this at job-local storage.
    val base = {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) shm.toPath else null
    }
    val p = if (base != null)
      java.nio.file.Files.createTempDirectory(base, "graft_scratch_")
    else java.nio.file.Files.createTempDirectory("graft_scratch_")
    sys.addShutdownHook(rm(p.toFile))
    p
  }

  private def rm(f: java.io.File): Unit = {
    // never recurse THROUGH a symlink: listFiles follows links, so an
    // operator layout that symlink-reuses another dir's files (q187's
    // untouched partitions) would have its TARGET emptied by a reset of
    // the link's parent — delete the link itself only
    if (!java.nio.file.Files.isSymbolicLink(f.toPath))
      Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete(); ()
  }

  /** Stable named dir, EMPTIED on every call — for append-mode sinks
    * (streaming partials) that must start from nothing each invocation. */
  def fresh(name: String): String = {
    val d = root.resolve(name)
    rm(d.toFile)
    java.nio.file.Files.createDirectories(d)
    d.toString
  }

  /** Stable named dir, kept across calls — for per-JVM caches
    * (Overwrite-mode writers, amortized indexes, materialized fixtures). */
  def dir(name: String): String = {
    val d = root.resolve(name)
    java.nio.file.Files.createDirectories(d)
    d.toString
  }
}
