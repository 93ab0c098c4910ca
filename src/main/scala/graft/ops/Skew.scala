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

  /** Oracle-checked driver entry: salted aggregation over l_returnflag —
    * 3 distinct keys over the whole fact table is the textbook hot-key
    * shape. The decimal partials make the two-phase result bit-equal to
    * the plain GROUP BY the oracle runs. */
  private val q66 = graft.Q(
    "q66_salted_agg",
    (s, dir) => {
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val li = graft.T(s, dir, "lineitem")
      saltedSumCount(li, "l_returnflag",
        col("l_quantity").cast(DecimalType(18, 2)), 32, "sum_qty", "n_rows")
        .select(col("l_returnflag"),
          col("sum_qty").cast(DoubleType).as("sum_qty"), col("n_rows"))
        .orderBy(asc_nulls_first("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag
      ORDER BY l_returnflag ASC NULLS FIRST"""),
    "two-phase salted hot-key aggregation, oracle-equal to the plain GROUP BY (scale surface)")

  /** Salted SKEW JOIN: fact side gets a random salt in [0, salts), the
    * build side is replicated `salts`× with every salt value, and the join
    * runs on (key, salt) — a hot fact key spreads over `salts` shuffle
    * partitions instead of one reducer. The manual twin of AQE's runtime
    * skew-join split, for when the skew is known up front (or the build
    * side is too big to broadcast but small enough to replicate). */
  def saltedJoin(fact: DataFrame, build: DataFrame, key: String,
      salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFact.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Oracle-checked: the salted join must be row-equal to the plain join.
    * Fact = lineitem keyed on l_returnflag (3 keys over the whole table —
    * maximal skew), build = a derived 3-row dim. */
  private val q79 = graft.Q(
    "q79_salted_join",
    (s, dir) => {
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val li = graft.T(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"))
      val dim = li.select(col("l_returnflag")).distinct()
        .withColumn("flag_weight", length(col("l_returnflag")) + 1)
      saltedJoin(li, dim, "l_returnflag", 32)
        .groupBy(col("l_returnflag"), col("flag_weight"))
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("sum_qty"), count(lit(1)).as("n_rows"))
        .orderBy(asc_nulls_first("l_returnflag"))
    },
    Some("""WITH dim AS (SELECT DISTINCT l_returnflag,
                CAST(length(l_returnflag) + 1 AS INT) AS flag_weight FROM lineitem)
      SELECT li.l_returnflag, flag_weight,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             COUNT(*) AS n_rows
      FROM lineitem li JOIN dim ON li.l_returnflag = dim.l_returnflag
      GROUP BY li.l_returnflag, flag_weight
      ORDER BY li.l_returnflag ASC NULLS FIRST"""),
    "salted hot-key JOIN (fact salted, build replicated), oracle-equal to the plain join (scale surface)")

  val all: Seq[graft.Q] = Seq(q66, q79)
}
