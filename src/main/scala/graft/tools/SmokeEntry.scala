package graft.tools
import org.apache.spark.sql.SparkSession
/** Simulates the driver's t1 smoke: a VANILLA session (no GraftExtensions,
  * no nanosAsLong) calling SparkEntry.entry — must return rows > 0. */
object SmokeEntry {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows=$n")
    df.show(10, false)
    spark.stop()
  }
}
