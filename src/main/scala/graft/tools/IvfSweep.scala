package graft.tools

import graft.{Sessions, T}
import org.apache.spark.sql.functions._

/** Dev-only: recall@10 of q193's IVF-PQ ADC search across
  * (trainIters, nprobe) on the sf0.01 embeddings — the measurement behind
  * IvfPqSpec's recall floor and q193's chosen operating point. */
object IvfSweep {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("local[8]", 8)
    val dir = "/root/testdata/sf0.01"
    val emb = T(spark, dir, "embeddings")
    val all = emb
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val queries = all.filter(_._1 < 5)
    val exact = queries.map { case (qid, qv) =>
      qid -> all.filter(_._1 != qid)
        .map { case (vid, v) =>
          (vid, qv.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum)
        }
        .sortBy { case (vid, d) => (d, vid) }.take(10).map(_._1).toSet
    }.toMap
    val combos = Seq(
      (2, 8, 128, 16), (2, 8, 256, 16),
      (3, 8, 128, 16), (2, 16, 128, 16), (2, 16, 256, 16))
    for ((iters, np, nc, g) <- combos) {
      val approx = graft.llm.Ivf.ivfPqTopK(spark, emb, 10, np, iters, nc, g)
        .select(col("qid"), col("vid")).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val hit = exact.map { case (q, ex) =>
        ex.intersect(approx.getOrElse(q, Set.empty)).size
      }.sum
      println(f"[ivfsweep] iters=$iters nprobe=$np codes=$nc groups=$g recall@10=${hit / 50.0}%.2f")
    }
    spark.stop()
  }
}
