package graft.tools

import graft.{Sessions, SparkEntry}

/** Dev-only interleaved A/B for the streaming state-store provider
  * (VERDICT r15 item 4): the five heaviest sf10 streaming queries sit on
  * a per-micro-batch state-commit floor (~181 s combined), documented but
  * never measured against the RocksDB provider AT SCALE — the r8 sf0.1
  * measurement (RocksDB slower on tiny state) does not predict sf10,
  * where stream-stream join state is orders of magnitude larger and the
  * HDFS-backed store pays a full in-heap map copy + delta-file write per
  * partition per batch.
  *
  *   tools/run.sh graft.tools.StreamAb <sfDir> <reps> [queries...]
  *
  * Providers alternate WITHIN one session (default,rocksdb,default,...)
  * so co-tenant drift lands on both arms equally — the PrAb protocol.
  * Each replay creates a fresh checkpoint dir, so flipping the provider
  * conf between runs is safe (the provider is pinned per checkpoint). */
object StreamAb {

  private val Rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private val defaultQueries = Seq(
    "q142_stream_incremental_dedup",
    "q224_full_outer_join_bucketed",
    "q168_stream_left_outer_join",
    "q223_left_outer_join_bucketed",
    "q198_stream_full_outer_join")

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val names = if (args.length > 2) args.drop(2).toSeq else defaultQueries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt)
    spark.range(1000).selectExpr("sum(id)").collect()
    val defaultProvider = spark.conf.get(ProviderKey)
    // arms: comma list of `label=provider|parts` specs via
    // GRAFT_STREAMAB_ARMS; provider `default`/`rocksdb`, parts empty to
    // keep each query's own count. Default = the provider A/B.
    val arms: Seq[(String, String, Option[String])] =
      sys.env.get("GRAFT_STREAMAB_ARMS") match {
        case Some(spec) => spec.split(",").toSeq.map { a =>
          val Array(label, pv) = a.split("=", 2)
          val parts = pv.split("\\|", -1)
          val provider =
            if (parts(0) == "rocksdb") Rocks else defaultProvider
          (label, provider,
            if (parts.length > 1 && parts(1).nonEmpty) Some(parts(1)) else None)
        }
        case None =>
          Seq(("default", defaultProvider, None), ("rocksdb", Rocks, None))
      }
    val times = scala.collection.mutable.Map.empty[(String, String), Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (r <- 1 to reps; (arm, provider, nParts) <- arms; n <- names) {
      spark.conf.set(ProviderKey, provider)
      nParts match {
        case Some(p) => sys.props("graft.state.parts") = p
        case None => sys.props.remove("graft.state.parts")
      }
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      times((n, arm)) = times((n, arm)) :+ sec
      println(f"[streamab] rep$r $arm $n: $sec%.2f s (rows=$c)")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    for (n <- names; (arm, _, _) <- arms) {
      val ts = times((n, arm)).sorted
      if (ts.nonEmpty)
        println(f"[streamab] SUMMARY $n $arm: min=${ts.head}%.2f " +
          f"med=${ts(ts.length / 2)}%.2f max=${ts.last}%.2f reps=${ts.length}")
    }
    spark.stop()
  }
}
