package graft.tools

import graft._
import org.apache.spark.sql.functions._

/** Dev-only: stage-cardinality + stage-time probe for q179 (PPJoin).
  * Usage: tools/run.sh graft.tools.PpjoinProbe <sfDir> */
object PpjoinProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = Sessions.build(s"local[$cpus]", cpus.toInt)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ppx] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s -> $r"); r
    }
    val sh = T.spread(s, T(s, dir, "documents"))
      .select(col("doc_id"), explode(llm.Dedup.shinglesPub("text")).as("sg"))
      .select(col("doc_id"), xxhash64(col("sg")).as("sgh"))
      .localCheckpoint()
    t("shingle rows")(sh.count())
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    t("docs")(sizes.count())
    val cands = llm.Dedup.ppjoinCandidates(sh, sizes).localCheckpoint()
    t("candidates (post len+pos filters, distinct)")(cands.count())
    val inter = cands
      .join(sh.select(col("doc_id").as("doc_a"), col("sgh")), Seq("doc_a"))
      .localCheckpoint()
    t("verify join 1 rows")(inter.count())
    val inter2 = inter
      .join(sh.select(col("doc_id").as("doc_b"), col("sgh")), Seq("doc_b", "sgh"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    t("verified pair rows")(inter2.count())
    s.stop()
  }
}
