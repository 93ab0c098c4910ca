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
}
