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
    for (rep <- 1 to 2) {
      t(s"rep$rep corpus sign+explode")(
        docs.select(col("doc_id"), explode(winnowUdf(col("text"))).as("fp")).count())
      t(s"rep$rep corpus sign only")(
        docs.select(size(winnowUdf(col("text")))).agg(sum(col("size(UDF(text))"))).count())
      t(s"rep$rep full q92")(
        SparkEntry.queries("q92_winnow_containment")(spark, dir).count())
    }
    spark.stop()
  }
}
