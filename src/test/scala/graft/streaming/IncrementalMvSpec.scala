package graft.streaming

import graft.Sessions
import org.scalatest.funsuite.AnyFunSuite

/** q117's oracle proves the FINAL MV equals the batch aggregate; this
  * spec proves the path there was actually INCREMENTAL — multiple
  * micro-batch merges, each persisted as a new MV version — and that
  * q121's retention really removed the expired partition directories
  * (facts the content-only oracle cannot see). */
class IncrementalMvSpec extends AnyFunSuite {

  private lazy val spark = Sessions.build("local[4]", 4)
  private val sf = "/root/testdata/sf0.001"

  test("incremental MV: several versions merged, not one big batch") {
    val out = Streams.incrementalMv(spark, sf)
    assert(out.count() > 0)
    // the stage dir holds 8 files, maxFilesPerTrigger=2 → ≥4 batches,
    // each writing MV version v<i>; the version dirs live in the shared
    // per-JVM scratch under the stable name the operator uses
    val mvRoot = new java.io.File(graft.Scratch.dir("mv_state"))
    val versions = mvRoot.listFiles().filter(_.getName.startsWith("v")).map(_.getName)
    assert(versions.length >= 4, s"expected ≥4 MV versions, got ${versions.mkString(",")}")
  }

  test("retention: expired day partitions are gone from the table layout") {
    val out = graft.SparkEntry.queries("q121_retention")(spark, sf)
    val days = out.collect().map(_.getString(0)).sorted
    assert(days.nonEmpty)
    val tbl = new java.io.File(
      graft.Scratch.dir(s"retained_events_${sf.hashCode.toHexString}"), "by_day")
    val dirs = tbl.listFiles().filter(_.getName.startsWith("day="))
      .map(_.getName.stripPrefix("day=")).sorted
    assert(dirs.length === days.length, s"layout ${dirs.length} dirs vs ${days.length} result days")
    assert(dirs.head === days.head, "oldest surviving partition must be the cutoff day")
  }
}
