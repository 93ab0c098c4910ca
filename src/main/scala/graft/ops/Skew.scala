package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (builder-prompt scale surface).
  *
  * AQE's skew-join splitting handles join skew at runtime; salting is the
  * complementary *aggregation* pattern for heavy-hitter keys: a two-phase
  * aggregate where phase 1 spreads each hot key over `salts` shuffle
  * partitions and phase 2 combines the partials. Correct for any algebraic
  * aggregate (sum/count/min/max); use count-distinct sketches separately. */
object Skew {

  /** Two-phase salted sum/count aggregation over `key`.
    * Equivalent to `df.groupBy(key).agg(sum(valueCol) as sumName,
    * count(*) as cntName)` but with no single reducer hot-spot. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: Column,
      salts: Int, sumName: String, cntName: String): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as(sumName), sum(col("__pcnt")).as(cntName))
}
