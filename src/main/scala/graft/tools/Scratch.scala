package graft.tools
import graft._
/** Dev-only profiling harness: time one query N times. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = Sessions.build("local[8]", 8)
    spark.range(1000).selectExpr("sum(id)").collect()
    if (args.length > 3) {
      val t0 = System.nanoTime()
      spark.range(10).selectExpr("count(case when contains(lower('aBc'), 'b') then 1 end)").collect()
      println(f"[scratch] lower-contains warmup: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(name)(spark, dir).count()
      println(f"[scratch] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
    }
    SparkEntry.queries(name)(spark, dir).explain("formatted")
    spark.stop()
  }
}
