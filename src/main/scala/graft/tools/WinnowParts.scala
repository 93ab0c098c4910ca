package graft.tools

import graft._
import org.apache.spark.sql.functions._

/** Dev-only q92 stage profile (VERDICT r14 #4): split the sf10 cost
  * between the corpus signing pass (winnow UDF + explode), the fp
  * equi-join, and the agg/window tail.
  * Usage: runMain graft.tools.WinnowParts <sfDir> */
object WinnowParts {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt)
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[part] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
    }
    val docs = T.spread(spark, T(spark, dir, "documents"))
      .select(col("doc_id"), col("text"))
    val winnowUdf = udf((text: String) =>
      graft.llm.Hashing.winnow(text, graft.llm.Dedup.WinnowK, graft.llm.Dedup.WinnowW))
    val probes = docs.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 200000).as("probe_id"),
        substring(col("text"), 11, 240).as("text"))
    if (args.contains("--df")) {
      val base = docs.select(col("doc_id"), explode(winnowUdf(col("text"))).as("fp"))
        .localCheckpoint()
      val df = base.groupBy(col("fp")).agg(count(lit(1)).as("df")).localCheckpoint()
      println("[df] corpus fp df histogram (log2 buckets):")
      df.groupBy(expr("cast(floor(log2(df)) as int)").as("b"))
        .agg(count(lit(1)).as("fps"), sum(col("df")).as("postings"))
        .orderBy(asc("b")).collect()
        .foreach(r => println(s"[df]   2^${r.getInt(0)}: ${r.getLong(1)} fps, ${r.getLong(2)} postings"))
      val pf = probes.select(col("probe_id"), explode(winnowUdf(col("text"))).as("fp"))
        .join(df, Seq("fp"), "left").localCheckpoint()
      for (cap <- Seq(128L, 1024L, 8192L, 65536L)) {
        val r = pf.agg(
          sum(when(col("df") <= cap, col("df")).otherwise(0L)).as("join_rows"),
          countDistinct(when(col("df") <= cap, col("probe_id"))).as("probes_alive")).head()
        println(s"[df] cap=$cap: join_rows=${r.getLong(0)} probes_alive=${r.getLong(1)}")
      }
      spark.stop(); return
    }
    for (rep <- 1 to 2) {
      t(s"rep$rep corpus sign+explode")(
        docs.select(col("doc_id"), explode(winnowUdf(col("text"))).as("fp")).count())
      t(s"rep$rep probe sign+explode")(
        probes.select(col("probe_id"), explode(winnowUdf(col("text"))).as("fp")).count())
      t(s"rep$rep join+agg (no window)") {
        val base = docs.select(col("doc_id"), explode(winnowUdf(col("text"))).as("fp"))
        val ex = probes
          .select(col("probe_id"), winnowUdf(col("text")).as("fps"))
          .withColumn("n_fp", size(col("fps")))
          .select(col("probe_id"), col("n_fp"), explode(col("fps")).as("fp"))
        base.join(ex, Seq("fp"))
          .groupBy(col("probe_id"), col("doc_id"))
          .agg(count(lit(1)).as("shared"), first(col("n_fp")).as("n_fp"))
          .count()
      }
      t(s"rep$rep full q92")(
        SparkEntry.queries("q92_winnow_containment")(spark, dir).count())
    }
    spark.stop()
  }
}
