package graft.llm

import graft.Sessions
import org.scalatest.funsuite.AnyFunSuite

class IvfSpec extends AnyFunSuite {

  private lazy val spark = Sessions.build("local[8]", 8)

  private def clusteredEmb = {
    import spark.implicits._
    // 4 well-separated clusters of 25 vectors each
    val r = new scala.util.Random(41)
    val centers = Array.fill(4)(Array.fill(Dedup.Dim)(r.nextGaussian() * 5))
    (0L until 100L).map { i =>
      val c = centers((i % 4).toInt)
      (i, c.map(x => (x + 0.1 * r.nextGaussian()).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("index covers every vector exactly once, lists within bounds") {
    val idx = Ivf.index(clusteredEmb)
    assert(idx.count() === 100)
    val lists = idx.select("list_id").distinct().collect().map(_.getInt(0))
    assert(lists.forall(l => l >= 0 && l < Ivf.NumLists))
  }

  test("IVF top-k finds same-cluster neighbors (high recall on separated clusters)") {
    val topk = Ivf.topK(spark, clusteredEmb, 10).collect()
    // every query's neighbors should come from its own cluster (id ≡ qid mod 4)
    val byQ = topk.groupBy(_.getLong(0))
    assert(byQ.keySet === Set(0L, 1L, 2L, 3L, 4L))
    byQ.foreach { case (qid, rows) =>
      assert(rows.length === 10, s"query $qid: ${rows.length} neighbors")
      val sameCluster = rows.count(r => r.getLong(1) % 4 == qid % 4)
      assert(sameCluster >= 9, s"query $qid: only $sameCluster/10 same-cluster")
      assert(rows.forall(_.getDouble(2) > 0.9))
    }
  }
}
