package graft.tools
import graft._
import org.apache.spark.sql.functions._
/** Dev-only: decompose q125's cost (join fan-out vs JW eval vs sort). */
object TimeJw {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.build("local[32]", 32)
    geo.GeoExpressions.ensureRegistered(spark)
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[jw] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
    }
    val g = 8
    val p = T(spark, dir, "part").select(col("p_partkey"), col("p_brand"), col("p_name"))
    def joined = {
      val a = p.withColumn("gj", explode(sequence(lit(0), lit(g - 1)))).alias("a")
      val b = p.withColumn("gi", pmod(xxhash64(col("p_partkey")), lit(g)).cast("int")).alias("b")
      a.join(b, col("a.p_brand") === col("b.p_brand") &&
        col("a.gj") === col("b.gi") && col("a.p_partkey") < col("b.p_partkey"))
    }
    for (_ <- 1 to 2) {
      t("join only count")(joined.count())
      t("join + jw count")(joined
        .select(org.apache.spark.sql.functions.call_function("jaro_winkler", col("a.p_name"), col("b.p_name")).as("s"))
        .filter(col("s") >= 0.93).count())
      t("full q125")(SparkEntry.queries("q125_jaro_winkler")(spark, dir).count())
    }
    spark.stop()
  }
}
