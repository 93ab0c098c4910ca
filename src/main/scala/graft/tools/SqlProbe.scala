package graft.tools
import graft._
/** Dev-only: probe SQL-surface support (correlated subqueries, recursive CTE). */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("local[4]", 4)
    T(spark, "/root/testdata/sf0.001", "orders").createOrReplaceTempView("orders")
    try {
      val n = spark.sql("""SELECT count(*) FROM orders o
        WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)""").head().getLong(0)
      println(s"CORRELATED_OK $n")
    } catch { case e: Throwable => println("CORRELATED_FAIL " + e.getMessage.take(100)) }
    try {
      val n = spark.sql("""WITH RECURSIVE r(n) AS (
          SELECT 1 UNION ALL SELECT n + 1 FROM r WHERE n < 5)
        SELECT sum(n) FROM r""").head().get(0)
      println(s"RECURSIVE_OK $n")
    } catch { case e: Throwable => println("RECURSIVE_FAIL " + e.getMessage.take(100)) }
    spark.stop()
  }
}
