package graft.tools

import graft.{Sessions, T}
import graft.llm.Dedup
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for q101's dedup pipeline (VERDICT r15 #6:
  * the sf30 gate flagged q101 at 4.4x sf10's time for 3x the rows —
  * this localizes which stage turned super-linear before touching the
  * plan). Times, in one warm session per rep:
  *   sigs   — md5 + 64-minhash signatures over the planted corpus
  *   pairs  — signatures -> LSH band self-join -> shingle verify
  *   cc     — pairs -> threshold edges -> connected components
  *   full   — the production q101 body end to end
  *
  * Usage: tools/run.sh graft.tools.Parts101 <sfDir> [reps]
  */
object Parts101 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val s = Sessions.build(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]", 32)

    def planted() = {
      val base = T.spread(s, T(s, dir, "documents")).select(col("doc_id"), col("text"))
      val span = base.agg(max(col("doc_id"))).head().getLong(0) + 1
      val near = base.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + lit(2L * span)).as("doc_id"),
          concat(col("text"), lit(" appended near dup suffix")).as("text"))
      val exact = base.filter(col("doc_id") % 40 === 0)
        .select((col("doc_id") + lit(3L * span)).as("doc_id"), col("text"))
      base.unionByName(near).unionByName(exact)
    }

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[p101] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
    }

    for (r <- 1 to reps) {
      println(s"[p101] === rep $r ===")
      val docs = planted()
      t("sigs  ")(Dedup.minhashSignatures(docs)
        .agg(count(lit(1))).head().getLong(0))
      t("pairs ")(Dedup.minhashPairs(s, docs).agg(count(lit(1))).head().getLong(0))
      t("cc    ") {
        val pairs = Dedup.minhashPairs(s, docs).filter(col("jaccard") >= 0.8)
          .select(col("doc_a").as("src"), col("doc_b").as("dst"))
        graft.ops.Graph.connectedComponents(
          docs.select(col("doc_id").as("node")), pairs)
          .agg(count(lit(1))).head().getLong(0)
      }
      t("full  ")(Dedup.dedupPipeline(s, docs, 0.8).agg(count(lit(1))).head().getLong(0))
    }
    s.stop()
  }
}
