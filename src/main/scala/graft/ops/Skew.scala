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

  /** q196: skew ADVISOR — the diagnostic that tells you whether q66/q79's
    * mitigations are even needed: the per-key count distribution of a
    * join/agg key, summarized as exact rank statistics (p50/p99/max of
    * key multiplicity), the p99/p50 ratio in bp, and the hot-key count
    * (> 3× median). Computed over the COUNT-OF-COUNTS table — |distinct
    * multiplicities| rows, a bounded domain, so the rank stats need no
    * global sort of keys (min-over-cumulative formulation, exactly
    * q175's half-weight trick). The oracle re-derives every statistic
    * declaratively from the same count-of-counts. */
  private val q196 = graft.Q(
    "q196_skew_advisor",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val perKey = graft.T(s, dir, "lineitem")
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("cnt"))
      val coc = perKey.groupBy(col("cnt")).agg(count(lit(1)).as("nk"))
      val w = Window.orderBy(asc("cnt"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy()
      val ranked = coc.withColumn("cum", sum(col("nk")).over(w))
        .withColumn("n_keys", sum(col("nk")).over(tot))
      val p50 = ranked.filter(col("cum") * 2 >= col("n_keys"))
        .agg(min(col("cnt"))).first().getLong(0)
      val p99 = ranked.filter(col("cum") * 100 >= col("n_keys") * 99)
        .agg(min(col("cnt"))).first().getLong(0)
      perKey.agg(count(lit(1)).as("n_keys"), max(col("cnt")).as("max_cnt"),
          sum((col("cnt") > 3 * p50).cast("long")).as("hot_keys"))
        .select(col("n_keys"), lit(p50).as("p50"), lit(p99).as("p99"),
          col("max_cnt"), expr(s"(10000 * ${p99}) div ${p50}").as("p99_p50_bp"),
          col("hot_keys"))
    },
    Some("""WITH pk AS (SELECT l_suppkey, COUNT(*) AS cnt FROM lineitem GROUP BY 1),
      coc AS (SELECT cnt, COUNT(*) AS nk FROM pk GROUP BY 1),
      tot AS (SELECT CAST(SUM(nk) AS BIGINT) AS n_keys FROM coc),
      p50 AS (SELECT MIN(cnt) AS v FROM coc a
              WHERE 2 * (SELECT SUM(nk) FROM coc b WHERE b.cnt <= a.cnt)
                    >= (SELECT n_keys FROM tot)),
      p99 AS (SELECT MIN(cnt) AS v FROM coc a
              WHERE 100 * (SELECT SUM(nk) FROM coc b WHERE b.cnt <= a.cnt)
                    >= 99 * (SELECT n_keys FROM tot))
      SELECT (SELECT n_keys FROM tot) AS n_keys,
             (SELECT v FROM p50) AS p50, (SELECT v FROM p99) AS p99,
             (SELECT MAX(cnt) FROM pk) AS max_cnt,
             CAST((10000 * (SELECT v FROM p99)) // (SELECT v FROM p50) AS BIGINT)
               AS p99_p50_bp,
             CAST((SELECT COUNT(*) FROM pk WHERE cnt > 3 * (SELECT v FROM p50)) AS BIGINT)
               AS hot_keys"""),
    "skew advisor: exact rank stats (p50/p99/max) of key multiplicity over the count-of-counts domain (no key sort), hot-key census; the diagnostic feeding q66/q79")

  val all: Seq[graft.Q] = Seq(q66, q79, q196)
}
