package graft.tools
import graft._
import graft.ops.Spatial
import org.apache.spark.sql.functions._
object TimeParts {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.build("local[8]", 8)
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[part] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
    }
    t("report full")(Spatial.report(spark, dir).count())
    t("report again")(Spatial.report(spark, dir).count())
    spark.stop()
  }
}
