package graft

import org.scalatest.funsuite.AnyFunSuite
import java.io.File
import java.nio.file.Files

/** Pins the staging+atomic-publish mechanics of the cross-JVM artifact
  * store (the class-doc contract; the two-JVM race was also validated
  * end-to-end: identical 500-row q82 outputs, one clean artifact dir).
  * No SparkSession needed — publish() is pure filesystem. */
class ArtifactsSpec extends AnyFunSuite {

  private def mkStage(root: File, marker: Boolean): File = {
    val d = new File(root, s".stage_${java.util.UUID.randomUUID.toString.take(8)}")
    d.mkdirs()
    Files.writeString(new File(d, "part-0.parquet").toPath, "data")
    if (marker) Files.writeString(new File(d, "_SUCCESS").toPath, "")
    d
  }

  test("publish renames the staging dir into place atomically") {
    val root = Files.createTempDirectory("artifacts_spec").toFile
    val stage = mkStage(root, marker = true)
    val dir = new File(root, "artifact_a")
    Artifacts.publish(stage, dir)
    assert(new File(dir, "_SUCCESS").isFile && new File(dir, "part-0.parquet").isFile)
    assert(!stage.exists(), "staging dir must be gone after the rename")
  }

  test("losing the race to a complete artifact discards the staging copy") {
    val root = Files.createTempDirectory("artifacts_spec").toFile
    val dir = new File(root, "artifact_b")
    Artifacts.publish(mkStage(root, marker = true), dir) // winner
    val winnerContent = Files.readString(new File(dir, "part-0.parquet").toPath)
    val loser = mkStage(root, marker = true)
    Files.writeString(new File(loser, "part-0.parquet").toPath, "loser-data")
    Artifacts.publish(loser, dir)
    assert(Files.readString(new File(dir, "part-0.parquet").toPath) === winnerContent,
      "the committed artifact must be untouched by the losing builder")
    assert(!loser.exists(), "the losing staging copy must be cleaned up")
    assert(root.listFiles().count(_.getName.startsWith(".stage_")) === 0)
  }

  test("a torn legacy target (no _SUCCESS) is cleared and replaced") {
    val root = Files.createTempDirectory("artifacts_spec").toFile
    val dir = new File(root, "artifact_c")
    dir.mkdirs() // torn in-place write: files but no marker
    Files.writeString(new File(dir, "part-0.parquet").toPath, "torn")
    val stage = mkStage(root, marker = true)
    Artifacts.publish(stage, dir)
    assert(new File(dir, "_SUCCESS").isFile, "replacement must be complete")
    assert(Files.readString(new File(dir, "part-0.parquet").toPath) === "data")
  }

  test("stale .stage_* dirs are swept by age; fresh ones survive") {
    val root = Files.createTempDirectory("artifacts_spec").toFile
    val stale = mkStage(root, marker = false)
    val twoHoursAgo = System.currentTimeMillis - 2L * 3600 * 1000
    stale.listFiles().foreach(_.setLastModified(twoHoursAgo))
    assert(stale.setLastModified(twoHoursAgo))
    val fresh = mkStage(root, marker = false)
    Artifacts.sweepStaleStages(root)
    assert(!stale.exists(), "an hour-old orphaned staging dir must be swept")
    assert(fresh.exists(), "a live builder's staging dir must be untouched")
  }

  test("content-hash fingerprint catches a length+mtime-preserving rewrite") {
    val spark = Sessions.build("local[2]", 2)
    val dir = Files.createTempDirectory("artifacts_fp").toFile
    spark.range(1000).write.mode("overwrite").parquet(dir.toString)
    val read = () => spark.read.parquet(dir.toString)
    val defaultBefore = Artifacts.fingerprint(read())
    sys.props("graft.artifacts.contentHash") = "true"
    try {
      val contentBefore = Artifacts.fingerprint(read())
      // in-place rewrite: flip one byte mid-file, restore the mtime —
      // the length+mtime key cannot see this, the content key must
      val part = dir.listFiles().filter(_.getName.endsWith(".parquet")).minBy(_.getName)
      val mtime = part.lastModified
      val raf = new java.io.RandomAccessFile(part, "rw")
      try {
        raf.seek(part.length / 2)
        val b = raf.read()
        raf.seek(part.length / 2)
        raf.write(b ^ 0xff)
      } finally raf.close()
      assert(part.setLastModified(mtime))
      assert(Artifacts.fingerprint(read()) !== contentBefore,
        "content hash must change under an in-place rewrite")
      sys.props.remove("graft.artifacts.contentHash")
      assert(Artifacts.fingerprint(read()) === defaultBefore,
        "the default length+mtime key is blind to the rewrite (the documented hole)")
    } finally sys.props.remove("graft.artifacts.contentHash")
  }
}
