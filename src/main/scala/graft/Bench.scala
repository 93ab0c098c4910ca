package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(s"local[$cpus]", cpus.toInt)
    // Warm-up: the one-time JVM costs (whole-stage codegen + Janino, the
    // kryo-buffered union aggregator, the percentile UDAF, streaming
    // micro-batch init) must not land on the first measured queries — in
    // round 1 they landed on q40 and inflated it 62 s vs its 2 s steady
    // state. Run three representative queries at the smallest sf first;
    // steady-state throughput is the honest metric.
    spark.range(1000).selectExpr("sum(id)").collect()
    val warmDir = sfDir.replaceAll("sf[0-9.]+", "sf0.001")
    for (w <- Seq("q40_flagship_report", "q28_cosine_topk", "q50_stream_tumbling"))
      try SparkEntry.queries(w)(spark, warmDir).count()
      catch { case _: Throwable => () }
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case _: Throwable => failed ::= name }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val sfNum = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1)).getOrElse("0")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":$sfNum}""")
    spark.stop()
  }
}
