package graft.tools

import graft.Sessions
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Dev-only interleaved A/B/A/B timing harness for q156 PageRank's
  * per-iteration materialization strategy (VERDICT r15 item 2).
  *
  * The sf10 q156 number swung 107 → 139 s across rounds ON IDENTICAL
  * CODE, so per-variant timing in separate sessions cannot rank the
  * variants — co-tenant drift between sessions exceeds the effect size.
  * This tool runs every variant inside ONE session, interleaved
  * (A,B,C,D,A,B,C,D,...), and reports per-variant min + median: the
  * interleaving turns slow co-tenant drift into noise shared equally by
  * all variants, and the spread across reps of the SAME variant bounds
  * the residual noise with a number.
  *
  *   tools/run.sh graft.tools.PrAb <sfDir> <reps> [variants...]
  *
  * Variants: eagerLC (production: per-iteration localCheckpoint(true)),
  * lazyLC (localCheckpoint(false) — materializes on first downstream
  * action, still truncates lineage), persistMD (MEMORY_AND_DISK persist
  * + count — keeps blocks in the unified memory pool instead of
  * checkpoint files), none (pure lineage — Catalyst compiles all 3
  * iterations into one job; viable only because iters is small). */
object PrAb {

  private val variants: Seq[(String, DataFrame => DataFrame)] = Seq(
    "eagerLC" -> (df => df.localCheckpoint(true)),
    "lazyLC" -> (df => df.localCheckpoint(false)),
    "persistMD" -> { df =>
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      p.count()
      p
    },
    "none" -> identity)

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val wanted = if (args.length > 2) args.drop(2).toSet else variants.map(_._1).toSet
    val run = variants.filter(v => wanted(v._1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt)
    spark.range(1000).selectExpr("sum(id)").collect()
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (r <- 1 to reps; (name, mat) <- run) {
      val t0 = System.nanoTime()
      val c = graft.ops.Graph.q156Shaped(spark, dir)(mat).count()
      val sec = (System.nanoTime() - t0) / 1e9
      times(name) = times(name) :+ sec
      println(f"[prab] rep$r $name: $sec%.2f s (rows=$c)")
      // drop checkpoint/persist blocks between measurements (TimeQ's
      // rationale: dead cache pressure lands on the NEXT measurement)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    for ((name, _) <- run) {
      val ts = times(name).sorted
      val med = ts(ts.length / 2)
      println(f"[prab] SUMMARY $name: min=${ts.head}%.2f med=$med%.2f " +
        f"max=${ts.last}%.2f spread=${(ts.last - ts.head) / ts.head * 100}%.0f%% " +
        f"reps=${ts.length}")
    }
    spark.stop()
  }
}
