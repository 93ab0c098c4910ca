package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dev-only A/B for VERDICT r14 #5 (q151's global presentation order):
  * the production shape materializes global positions with the q112
  * two-level trick (64 hash-range buckets per band, broadcast bucket
  * offsets, per-bucket row_number). The candidate is Spark's native
  * range machinery: repartitionByRange on the total-order key +
  * sortWithinPartitions + one zipWithIndex pass. Same total order
  * (phase asc, h asc, doc_id asc) either way — this tool checks exact
  * result equality at a small sf and times both at the big one.
  *
  * Usage: runMain graft.tools.CurriculumAb <sfDir> <reps>
  */
object CurriculumAb {

  /** q151's banding stages, reproduced through the public score frame:
    * decile thresholds by value runs, band, Knuth hash, phase. */
  private def banded(s: SparkSession, dir: String): DataFrame = {
    val scores = graft.llm.Curation.bigramScores(s, dir)
      .select(col("doc_id"), col("avg_ppm")).localCheckpoint()
    val tot = scores.count()
    val vals = scores.groupBy(col("avg_ppm")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(Window.orderBy(asc("avg_ppm"))))
    val ranks = (1 to 9).map(k => (k * tot) / 10)
    val thr = vals
      .select(col("avg_ppm"), col("cum"), col("c"),
        explode(lit(ranks.toArray)).as("r"))
      .filter(col("cum") >= col("r") && col("cum") - col("c") < col("r"))
      .agg(sort_array(collect_list(col("avg_ppm"))).as("ts"))
    scores.crossJoin(broadcast(thr))
      .select(col("doc_id"),
        (size(expr("filter(ts, t -> avg_ppm > t)")) + 1).cast(LongType).as("band"))
      .withColumn("h", (col("doc_id") * 1315423911L) % 1048573L)
      .withColumn("phase", lit(10L) - col("band"))
  }

  /** Candidate: range-partition the banded frame on the total-order key,
    * sort within partitions, then one zipWithIndex for global positions
    * (an extra count job over the sorted RDD, but no bucket groupBy, no
    * offsets join, no per-bucket window). */
  private def rangeVariant(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val b = banded(s, dir)
    val sorted = b
      .repartitionByRange(s.sparkContext.defaultParallelism * 2,
        asc("phase"), asc("h"), asc("doc_id"))
      .sortWithinPartitions(asc("phase"), asc("h"), asc("doc_id"))
      .select(col("doc_id"), col("band"))
    val indexed = sorted.as[(Long, Long)].rdd.zipWithIndex()
      .map { case ((id, band), pos) => (id, band, pos) }
    s.createDataFrame(indexed).toDF("doc_id", "band", "pos")
      .filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("band"), col("pos").cast(LongType).as("pos"))
      .orderBy(asc_nulls_first("pos"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = graft.Sessions.build(s"local[$cpus]", cpus.toInt)
    // equality first (cheap dir assumed small enough, else pass sf0.1):
    val prod = graft.SparkEntry.queries("q151_curriculum_order")(s, dir).collect()
    val cand = rangeVariant(s, dir).collect()
    val same = prod.length == cand.length &&
      prod.zip(cand).forall { case (a, b) =>
        a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1) &&
          a.getLong(2) == b.getLong(2) }
    println(s"[curriculum-ab] equality: $same (${prod.length} vs ${cand.length} rows)")
    for (r <- 1 to reps) {
      var t0 = System.nanoTime()
      graft.SparkEntry.queries("q151_curriculum_order")(s, dir).count()
      println(f"[curriculum-ab] rep$r two-level: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      t0 = System.nanoTime()
      rangeVariant(s, dir).count()
      println(f"[curriculum-ab] rep$r range+zip: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    s.stop()
  }
}
