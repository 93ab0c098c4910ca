package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-JVM artifact store for small derived tables that are expensive
  * to recompute but cheap to keep: trained PQ codebooks, dedup-cluster
  * component labelings — things a production engine publishes to a
  * catalog next to the data rather than rebuilding per process (FAISS
  * persists its quantizer with the index; dedup systems materialize the
  * cluster assignment as a table). [[Scratch]] is the complement: per-JVM
  * working space, deleted at exit; artifacts survive the JVM and are
  * keyed by CONTENT fingerprint + parameters, so a regenerated corpus or
  * changed parameters build a NEW artifact instead of serving stale
  * results.
  *
  * Atomicity: each builder writes to a private staging directory and
  * ATOMIC_MOVE-renames it into place — concurrent builders race benignly
  * (the loser deletes its staging copy and reads the winner's), and a
  * torn write is an unreferenced staging dir, never a half-read
  * artifact. The _SUCCESS marker remains the completeness check for
  * artifacts written by older code paths. */
object Artifacts {

  /** Artifact root — overridable for tests (system property, checked
    * per call so a spec can point at a fresh dir in-process) and
    * deployments (env var). */
  def root: String =
    sys.props.get("graft.artifacts")
      .orElse(sys.env.get("GRAFT_ARTIFACTS"))
      .getOrElse(sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_artifacts")

  /** Content fingerprint of a frame's backing files: path + length +
    * mtime per file, SHA-256-folded to 16 hex chars. Empty string for
    * in-memory frames (no stable identity to key on — callers must
    * build fresh). */
  def fingerprint(df: DataFrame): String = {
    val files = df.inputFiles
    if (files.isEmpty) ""
    else {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      files.sorted.foreach { f =>
        val p = try new java.io.File(new java.net.URI(f)) catch {
          case _: Exception => new java.io.File(f)
        }
        md.update(s"$f:${p.length}:${p.lastModified}".getBytes("UTF-8"))
      }
      md.digest().take(8).map(b => f"$b%02x").mkString
    }
  }

  /** True iff `dir` holds a complete artifact (committed rename always
    * includes Spark's _SUCCESS marker). */
  private def complete(dir: java.io.File): Boolean =
    new java.io.File(dir, "_SUCCESS").isFile

  private def deleteTree(f: java.io.File): Unit = {
    import java.nio.file.Files
    if (f.exists()) {
      val walk = Files.walk(f.toPath)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { Files.deleteIfExists(p); () })
      finally walk.close()
    }
  }

  /** Publish `stage` as `dir` atomically; if another builder won the
    * race with a COMPLETE artifact, discard the staging copy and use the
    * winner's; a torn target (no marker — e.g. a legacy in-place write
    * that crashed) is cleared and the move retried once. */
  def publish(stage: java.io.File, dir: java.io.File): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    def move(): Unit = {
      Files.move(stage.toPath, dir.toPath, StandardCopyOption.ATOMIC_MOVE); ()
    }
    try move()
    catch {
      case _: java.nio.file.FileSystemException if complete(dir) =>
        deleteTree(stage) // lost the race to an identical build
      case _: java.nio.file.FileSystemException =>
        deleteTree(dir)   // torn target from a crashed legacy write
        try move()
        catch {
          case _: java.nio.file.FileSystemException if complete(dir) =>
            deleteTree(stage)
        }
    }
  }

  /** Serve the artifact at `key`, building and persisting it first if no
    * complete artifact exists. The build writes to a staging dir and
    * renames into place (see class doc), so two concurrent sessions can
    * never interleave part files under one _SUCCESS. The returned frame
    * reads FROM the artifact in both cases, so first-build and reload
    * callers see the identical physical table. */
  def cached(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val dir = new java.io.File(root, key)
    if (!complete(dir)) {
      val stage = new java.io.File(root,
        s".stage_${key}_${java.util.UUID.randomUUID.toString.take(8)}")
      build.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      publish(stage, dir)
    }
    s.read.parquet(dir.toString)
  }
}
