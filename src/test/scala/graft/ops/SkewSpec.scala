package graft.ops

import graft.Sessions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {

  private lazy val spark = Sessions.build("local[8]", 8)

  test("salted two-phase agg equals direct agg on a skewed distribution") {
    import spark.implicits._
    // 90% of rows share one key — the classic hot-key shape
    val df = spark.range(100000)
      .select((when(col("id") % 10 =!= 0, lit(7)).otherwise(col("id") % 100)).as("k"),
        (col("id") % 13).cast("double").as("v"))
    val direct = df.groupBy("k")
      .agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    val salted = Skew.saltedSumCount(df, "k", col("v"), 16, "s", "c")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    assert(salted === direct)
  }

  test("approx count-distinct stays within 5% of exact per group (q67 vs q55)") {
    val dir = "/root/testdata/sf0.001"
    val exact = graft.SparkEntry.queries("q55_count_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = graft.SparkEntry.queries("q67_approx_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      val relErr = math.abs(ap - ex).toDouble / math.max(1L, ex)
      assert(relErr < 0.05, s"group $k: approx $ap vs exact $ex (err $relErr)")
    }
  }
}
