package graft.tools

import graft._
import org.apache.spark.sql.functions._

/** Dev-only q146/q151 stage profile: where do the ~55 s at sf10 go —
  * tokenize+explode, the (w1,w2) count shuffle, or the score join?
  * Usage: runMain graft.tools.BigramParts <sfDir> */
object BigramParts {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt)
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[part] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
    }
    val bigrams = T(spark, dir, "documents")
      .select(col("doc_id"), expr("filter(split(text, ' '), x -> x <> '')").as("ws"))
      .select(col("doc_id"),
        explode(expr(
          "CASE WHEN size(ws) >= 2 THEN transform(sequence(1, size(ws) - 1), " +
            "i -> struct(ws[i - 1] AS w1, ws[i] AS w2)) ELSE array() END")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    for (rep <- 1 to 2) {
      t(s"rep$rep explode only")(bigrams.count())
      t(s"rep$rep cnt2 shuffle")(
        bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1))).count())
      t(s"rep$rep full bigramScores")(
        graft.llm.Curation.bigramScores(spark, dir).count())
    }
    spark.stop()
  }
}
