package graft.tools
import graft._
/** Dev tool: dump formatted plans for plan-audit (pushdown/broadcast/codegen). */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("local[8]", 8)
    val dir = "/root/testdata/sf0.01"
    args.foreach { name =>
      println(s"########## $name ##########")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
