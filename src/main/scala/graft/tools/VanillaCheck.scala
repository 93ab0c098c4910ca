package graft.tools

/** Dev-only: mimic the driver's t1 smoke — SparkEntry.entry on a session
  * built WITHOUT GraftExtensions (ensureRegistered must self-heal). */
object VanillaCheck {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val rows = graft.SparkEntry.entry(s).count()
    println(s"[vanilla] entry rows=$rows")
    require(rows > 0)
    s.stop()
  }
}
