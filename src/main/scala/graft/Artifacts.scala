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
  * Atomicity is Spark's _SUCCESS marker: a torn write (crash mid-build)
  * has no marker and is rebuilt, never half-read. */
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

  /** Serve the artifact at `key`, building and persisting it first if no
    * complete artifact exists. The returned frame reads FROM the
    * artifact in both cases, so first-build and reload callers see the
    * identical physical table. */
  def cached(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val dir = new java.io.File(root, key)
    if (!new java.io.File(dir, "_SUCCESS").isFile)
      build.coalesce(1).write.mode("overwrite").parquet(dir.toString)
    s.read.parquet(dir.toString)
  }
}
