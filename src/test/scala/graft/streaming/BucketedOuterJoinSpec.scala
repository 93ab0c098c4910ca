package graft.streaming

import graft.Sessions
import org.scalatest.funsuite.AnyFunSuite

/** q223/q224's reconciliation laws: the (user, 24 h bucket) state
  * sharding emits a spurious null row per matchless BUCKET of an
  * exploded trade, and the published aggregates must absorb them — the
  * left join via null-skipping count/sum, the full join via trade-keyed
  * "total matches = 0" orphan detection. Pinned by value equality
  * against the bare-key variants on the real fixture, which exercises
  * all three trade shapes (matched in both buckets, matched in one,
  * matched in none — sf0.001 has 46 matchless trades). */
class BucketedOuterJoinSpec extends AnyFunSuite {

  private lazy val spark = Sessions.build("local[4]", 4)
  private val dir = "/root/testdata/sf0.001"

  test("bucketed left-outer equals the bare-key left-outer row for row") {
    val bare = Streams.streamLeftOuterJoin(spark, dir).collect()
    val bucketed = Streams.streamLeftOuterJoinBucketed(spark, dir).collect()
    assert(bucketed.length == bare.length)
    val want = bare.map(r => (r.getLong(0), r.getLong(1),
      Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    val got = bucketed.map(r => (r.getLong(0), r.getLong(1),
      Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    assert(got == want)
    // the fixture exercises the unmatched shape: some (0, NULL) trades
    assert(got.exists(t => t._2 == 0L && t._3.isEmpty))
    // and the matched shape
    assert(got.exists(_._2 > 0L))
  }

  test("bucketed full-outer reconciliation equals the bare-key summary") {
    val bare = Streams.streamFullOuterJoin(spark, dir).collect()(0)
    val bucketed = Streams.streamFullOuterJoinBucketed(spark, dir).collect()(0)
    for (i <- 0 until 5)
      assert(bucketed.get(i) == bare.get(i), s"col $i: ${bucketed.get(i)} vs ${bare.get(i)}")
    // sanity: both orphan classes are non-empty on the fixture, so the
    // trade-keyed zero-match detection and the quote-orphan pass both ran
    assert(bare.getLong(1) > 0L, "no unmatched trades in fixture")
    assert(bare.getLong(2) > 0L, "no unmatched quotes in fixture")
  }
}
