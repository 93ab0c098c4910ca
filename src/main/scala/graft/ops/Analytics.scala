package graft.ops

import graft.{Q, T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
import org.apache.spark.sql.expressions.Window

/** Round-4 relational/analytic extensions beyond the reference's §2 surface:
  * anti/semi join chains, pivot, grouping sets, time-series gap-fill with
  * linear interpolation, sort-free quantile bucketing, blocked edit-distance
  * similarity, set operations, deterministic sampling. All DuckDB-oracled
  * (conventions on [[graft.Q]]). */
object Analytics {

  private def dec(c: String): org.apache.spark.sql.Column =
    col(c).cast(DecimalType(18, 2))

  /** Semi + anti join chain: customers who ordered in 1995 but never in
    * 1996. Both joins shuffle only the distinct key column; at scale the
    * year-filtered key sets are small enough to broadcast, which AQE does
    * on its own once the filtered size is known at runtime. */
  private val q83 = Q(
    "q83_anti_join",
    (s, dir) => {
      val orders = T(s, dir, "orders")
      val o95 = orders.filter(year(col("o_orderdate")) === 1995)
        .select(col("o_custkey"))
      val o96 = orders.filter(year(col("o_orderdate")) === 1996)
        .select(col("o_custkey"))
      T(s, dir, "customer")
        .join(o95, col("c_custkey") === col("o_custkey"), "left_semi")
        .join(o96, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(asc_nulls_first("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                    AND year(o.o_orderdate) = 1995)
        AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                    AND year(o.o_orderdate) = 1996)
      ORDER BY c_custkey ASC NULLS FIRST"""),
    "left-semi + left-anti join chain (churn analysis shape)")

  /** Pivot: order priority × status revenue matrix. The status values are
    * passed EXPLICITLY — without them Spark first runs a distinct() scan
    * just to learn the column set, an extra full pass at 100 TB. */
  private val q84 = Q(
    "q84_pivot",
    (s, dir) =>
      T(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(sum(dec("o_totalprice")).cast(DoubleType))
        .withColumnRenamed("F", "total_f")
        .withColumnRenamed("O", "total_o")
        .withColumnRenamed("P", "total_p")
        .orderBy(asc_nulls_first("o_orderpriority")),
    Some("""SELECT o_orderpriority,
      CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS total_f,
      CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS total_o,
      CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS total_p
      FROM orders GROUP BY o_orderpriority
      ORDER BY o_orderpriority ASC NULLS FIRST"""),
    "pivot with explicit value list (one pass, no discovery scan)")

  /** GROUPING SETS — the general form behind q56 ROLLUP / q63 CUBE: the
    * exact level list, one shuffle, partial aggregation per set. */
  private val q85 = Q(
    "q85_grouping_sets",
    (s, dir) =>
      T(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(dec("l_quantity")).cast(DoubleType).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
    Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""),
    "explicit GROUPING SETS (general form of q56/q63)")

  /** Time-series gap-fill + linear interpolation: per-series hourly sums,
    * a per-series hour spine (the driver events genuinely miss ~3% of
    * hours per series slice), missing hours linearly interpolated between
    * the bracketing observations (edges clamp to the nearest value).
    *
    * Scale shape: every window is PARTITIONED by the series key — there is
    * no global sort; a 100 TB corpus with millions of series parallelizes
    * per key. The spine is generated per series from its own min/max hour
    * (sequence() per group row), not one driver-side calendar. */
  private val q86 = Q(
    "q86_interpolate",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hourly = T(s, dir, "events")
        .select((col("user_id") % 4).as("g"),
          expr("unix_micros(ts) div 3600000000").as("hr"), col("value"))
        .groupBy(col("g"), col("hr"))
        .agg(sum(dec("value")).cast(DoubleType).as("v"))
      val spine = hourly.groupBy(col("g"))
        .agg(min(col("hr")).as("mn"), max(col("hr")).as("mx"))
        .select(col("g"), explode(sequence(col("mn"), col("mx"))).as("hr"))
      val wPrev = Window.partitionBy(col("g")).orderBy(asc("hr"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.partitionBy(col("g")).orderBy(asc("hr"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      spine.join(hourly, Seq("g", "hr"), "left")
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
        .withColumn("pt", last(when(col("v").isNotNull, col("hr")), ignoreNulls = true).over(wPrev))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
        .withColumn("nt", first(when(col("v").isNotNull, col("hr")), ignoreNulls = true).over(wNext))
        .select(col("g"), col("hr"),
          round(
            when(col("v").isNotNull, col("v"))
              .when(col("pv").isNull, col("nv"))
              .when(col("nv").isNull, col("pv"))
              .otherwise(col("pv") + (col("nv") - col("pv")) *
                ((col("hr") - col("pt")).cast(DoubleType) /
                  (col("nt") - col("pt")).cast(DoubleType))), 6).as("val"),
          when(col("v").isNull, 1).otherwise(0).as("interpolated"))
        .orderBy(asc_nulls_first("g"), asc_nulls_first("hr"))
    },
    Some("""WITH h AS (SELECT user_id % 4 AS g, epoch_us(ts) // 3600000000 AS hr,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
             FROM events GROUP BY 1, 2),
      mm AS (SELECT g, min(hr) AS mn, max(hr) AS mx FROM h GROUP BY g),
      spine AS (SELECT g, unnest(generate_series(mn, mx)) AS hr FROM mm),
      j AS (SELECT s.g, s.hr, h.v FROM spine s
            LEFT JOIN h ON h.g = s.g AND h.hr = s.hr),
      w AS (SELECT g, hr, v,
        last_value(v IGNORE NULLS) OVER (PARTITION BY g ORDER BY hr
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS) OVER (PARTITION BY g ORDER BY hr
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        first_value(v IGNORE NULLS) OVER (PARTITION BY g ORDER BY hr
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS) OVER (PARTITION BY g ORDER BY hr
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
        FROM j)
      SELECT g, hr,
        round(CASE WHEN v IS NOT NULL THEN v
                   WHEN pv IS NULL THEN nv
                   WHEN nv IS NULL THEN pv
                   ELSE pv + (nv - pv) * (CAST(hr - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE)) END, 6) AS val,
        CASE WHEN v IS NULL THEN 1 ELSE 0 END AS interpolated
      FROM w ORDER BY g ASC NULLS FIRST, hr ASC NULLS FIRST"""),
    "per-series gap-fill + linear interpolation, windows partitioned by series key (no global sort)")

  /** Quantile bucketing WITHOUT a global sort: exact quartile cutpoints in
    * one aggregation pass, broadcast back, per-row CASE assignment. ntile()
    * would need a total order over the table — this shape is the 100 TB
    * equivalent. Cutpoints are rounded to 2 decimals on both engines so
    * interpolation ulp drift cannot move a boundary. */
  private val q87 = Q(
    "q87_quantile_bucketize",
    (s, dir) => {
      val orders = T(s, dir, "orders")
      val cuts = orders.agg(
        round(expr("percentile(o_totalprice, 0.25D)"), 2).as("c1"),
        round(expr("percentile(o_totalprice, 0.50D)"), 2).as("c2"),
        round(expr("percentile(o_totalprice, 0.75D)"), 2).as("c3"))
      orders.crossJoin(broadcast(cuts))
        .select(
          when(col("o_totalprice") <= col("c1"), 1)
            .when(col("o_totalprice") <= col("c2"), 2)
            .when(col("o_totalprice") <= col("c3"), 3)
            .otherwise(4).as("bucket"),
          col("o_totalprice"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(dec("o_totalprice")).cast(DoubleType).as("total"),
          min(col("o_totalprice")).as("mn"), max(col("o_totalprice")).as("mx"))
        .orderBy(asc_nulls_first("bucket"))
    },
    Some("""WITH c AS (SELECT round(quantile_cont(o_totalprice, 0.25), 2) AS c1,
                round(quantile_cont(o_totalprice, 0.50), 2) AS c2,
                round(quantile_cont(o_totalprice, 0.75), 2) AS c3 FROM orders)
      SELECT CASE WHEN o_totalprice <= c1 THEN 1
                  WHEN o_totalprice <= c2 THEN 2
                  WHEN o_totalprice <= c3 THEN 3 ELSE 4 END AS bucket,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             min(o_totalprice) AS mn, max(o_totalprice) AS mx
      FROM orders, c GROUP BY 1 ORDER BY bucket ASC NULLS FIRST"""),
    "sort-free quantile bucketing: one-pass exact cutpoints + broadcast CASE assignment")

  /** Blocked edit-distance similarity join. Blocking key = (p_brand,
    * candidate name length): edit distance ≤ 2 implies |len(a)-len(b)| ≤ 2,
    * so the probe side explodes each row into its 5 admissible partner
    * lengths and the join is a pure equi-join on (brand, length) — LOSSLESS
    * w.r.t. the final predicate, and the quadratic term is bounded by the
    * largest (brand × length) block, not the brand block alone (p_brand has
    * only 25 distinct values, so brand-only blocks grow linearly with the
    * table and pair counts quadratically — brand×length keeps blocks ~35×
    * smaller here and the same trick composes with any extra key at 100 TB).
    * Verification runs in two lossless stages: (1) a bag-of-characters
    * L1 prefilter — one edit operation changes character counts by at
    * most 2 (substitution) or 1 (indel), so dist ≤ 2 forces L1 ≤ 4;
    * the 26-dim count vectors are computed ONCE per row map-side and the
    * pair check is 26 byte subtractions, an order of magnitude cheaper
    * than the DP it gates (≈97% of blocked pairs die here); (2) the
    * threshold form levenshtein(a, b, 2), which early-exits the DP once
    * the bound is exceeded (returns -1), so the exact distance is only
    * computed inside the banded diagonal of surviving pairs. */
  // 36 dims: a-z AND 0-9. Counting digits matters on any corpus whose
  // near-identical names differ in a numeric field (versioned SKUs,
  // salted fixtures): those pairs then die in the 36-byte L1 check
  // instead of reaching the DP. Ignoring other characters only weakens
  // the filter — never makes it lossy.
  private val charVecUdf = udf((s: String) => {
    val v = new Array[Byte](36)
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      val c = if (ch >= 'a' && ch <= 'z') ch - 'a'
      else if (ch >= '0' && ch <= '9') 26 + (ch - '0')
      else -1
      if (c >= 0) v(c) = (v(c) + 1).toByte
      i += 1
    }
    v
  })

  private val l1Udf = udf((a: Array[Byte], b: Array[Byte]) => {
    var d = 0
    var i = 0
    while (i < 36) { d += math.abs(a(i) - b(i)); i += 1 }
    d
  })

  private val q89 = Q(
    "q89_edit_distance",
    (s, dir) => {
      // DEDUPE-FIRST (r8): the DP runs on DISTINCT (brand, name) cells,
      // not on rows. The r7 (brand, length-window) row-level blocking was
      // lossless but not scale-stable: TPC-H brand cardinality is fixed,
      // so blocks grew ~linearly with SF and the self-join quadratically
      // — measured 4.4 s at sf0.1 → 74.6 s at sf1 (17x at 10x rows). The
      // name VOCABULARY however is corpus-bounded (64 names × 25 brands
      // here; the standard ER move on any literal-repeating corpus), so
      // all L1-prefilter + threshold-DP work happens on a ~10^3-row cell
      // frame whose within-brand all-pairs is a broadcast-sized map-side
      // job, and the only big stages are the two expansion joins back to
      // the part rows — output-bound, which the query inherently is (the
      // answer itself is quadratic in per-name duplication). At a scale
      // where names were all-distinct, cells degenerate to rows and a
      // gram-prefix scheme would be needed instead; with a bounded
      // vocabulary this is strictly better and still exact.
      val p = T(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_name"))
      val cells = p.select(col("p_brand"), col("p_name")).distinct()
        .withColumn("cv", charVecUdf(col("p_name")))
        .withColumn("len", length(col("p_name")))
      // dist ≤ 2 ⇒ |len(a)−len(b)| ≤ 2, so the probe side explodes into
      // its 5 admissible partner lengths and the cell join is a pure
      // (brand, length) EQUI-join — the r12 brand-only join left the
      // length cut as a post-join filter, which is fine while the cell
      // frame is tiny but quadratic-in-cells when the vocabulary grows
      // with the corpus (sf10: 160 k cells → 10⁹ brand-block pairs, two
      // AQE-coalesced tasks). The repartition keeps this compute-dense
      // probe side at full width (T.spread's reason: the frame is small,
      // the work per pair is not).
      val ca = cells.select(col("p_brand"), col("p_name").as("name_a"),
        col("cv").as("cv_a"), col("len").as("len_a"))
        .withColumn("jlen", explode(array((-2 to 2).map(d => col("len_a") + lit(d)): _*)))
        .repartition(s.sparkContext.defaultParallelism)
      val cb = cells.select(col("p_brand"), col("p_name").as("name_b"),
        col("cv").as("cv_b"), col("len").as("len_b"), col("len").as("jlen"))
      // ordered cell pairs INCLUDING name_a = name_b (the dist-0 clone
      // cells); member-level key_a < key_b below picks each row pair once
      val cellPairs = ca.join(cb, Seq("p_brand", "jlen"))
        .filter(l1Udf(col("cv_a"), col("cv_b")) <= 4)
        .select(col("p_brand"), col("name_a"), col("name_b"),
          // Spark levenshtein is int32, DuckDB's int64 — BIGINT convention
          levenshtein(col("name_a"), col("name_b"), 2).cast(LongType).as("dist"))
        .filter(col("dist") >= 0)
      p.select(col("p_brand"), col("p_name").as("name_a"), col("p_partkey").as("key_a"))
        .join(broadcast(cellPairs), Seq("p_brand", "name_a"))
        .join(p.select(col("p_brand"), col("p_name").as("name_b"),
          col("p_partkey").as("key_b")), Seq("p_brand", "name_b"))
        .filter(col("key_a") < col("key_b"))
        .select(col("key_a"), col("key_b"), col("dist"))
        .orderBy(asc_nulls_first("key_a"), asc_nulls_first("key_b"))
    },
    Some("""SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
             levenshtein(a.p_name, b.p_name) AS dist
      FROM part a JOIN part b
        ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
      WHERE levenshtein(a.p_name, b.p_name) <= 2
      ORDER BY key_a ASC NULLS FIRST, key_b ASC NULLS FIRST"""),
    "blocked Levenshtein similarity join (entity resolution; blocking bounds the pair count)")

  /** Set operations: INTERSECT / EXCEPT over year-sliced customer key sets
    * (both are distinct-based in Spark and ANSI SQL). */
  private val q90 = Q(
    "q90_set_ops",
    (s, dir) => {
      val orders = T(s, dir, "orders")
      def yr(y: Int) = orders.filter(year(col("o_orderdate")) === y)
        .select(col("o_custkey"))
      yr(1995).intersect(yr(1996)).withColumn("tag", lit("both"))
        .unionByName(yr(1995).except(yr(1996)).withColumn("tag", lit("only_1995")))
        .select(col("tag"), col("o_custkey"))
        .orderBy(asc_nulls_first("tag"), asc_nulls_first("o_custkey"))
    },
    Some("""SELECT 'both' AS tag, o_custkey FROM
        (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
         INTERSECT
         SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
      UNION ALL
      SELECT 'only_1995' AS tag, o_custkey FROM
        (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
         EXCEPT
         SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
      ORDER BY tag ASC NULLS FIRST, o_custkey ASC NULLS FIRST"""),
    "INTERSECT/EXCEPT set operations over year-sliced key sets")

  /** Deterministic (reproducible) ~5% sample: a pure-arithmetic row
    * predicate, no RNG — the only sampling that is re-runnable,
    * engine-portable, and auditable in a training-data pipeline.
    * (Bernoulli TABLESAMPLE is not cross-engine reproducible.) */
  private val q91 = Q(
    "q91_deterministic_sample",
    (s, dir) =>
      T(s, dir, "lineitem")
        .filter((col("l_orderkey") * 7 + col("l_linenumber")) % 20 === 0)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(dec("l_extendedprice")).cast(DoubleType).as("sum_price"))
        .orderBy(asc_nulls_first("l_returnflag")),
    Some("""SELECT l_returnflag, COUNT(*) AS n,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM lineitem WHERE (l_orderkey * 7 + l_linenumber) % 20 = 0
      GROUP BY l_returnflag ORDER BY l_returnflag ASC NULLS FIRST"""),
    "deterministic arithmetic sampling (reproducible across engines/runs)")

  /** q112: deterministic global shuffle (training-order permutation) —
    * every epoch pipeline needs a reproducible random-looking total order
    * over the corpus. The naive plan (row_number over a global ORDER BY)
    * collapses into ONE partition's window; this one never does: the mix
    * hash is range-bucketed by its high bits (bucket = h div 16384, so
    * bucket order == hash order), positions are
    * `global = bucket offset + local row_number`, where the offsets are a
    * 64-row prefix-sum (tiny, broadcast back) and the row_number window is
    * PARTITIONED by bucket — at 100 TB every stage is either O(#buckets)
    * or embarrassingly parallel, and the permutation is identical on any
    * cluster size. DuckDB replays it as the straight global row_number,
    * proving the two formulations agree row-for-row. */
  /** (doc_id, pos): a bijection of the input ids onto 0..n-1 in mix-hash
    * order — the distributed global-sort-index kernel behind q112. See the
    * q112 doc for the bucketing argument; `ShuffleOrderSpec` pins the
    * bijectivity and determinism properties. */
  def globalShufflePositions(ids: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val base = ids
      .select(col("doc_id"),
        ((col("doc_id") * 1315423911L) % 1048573L).as("h"))
      .withColumn("bucket", expr("h div 16384"))
    val offsets = base.groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
      .withColumn("off",
        coalesce(sum(col("cnt")).over(
          Window.orderBy(asc("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("cnt")
    val w = Window.partitionBy(col("bucket"))
      .orderBy(asc("h"), asc("doc_id"))
    base.join(broadcast(offsets), Seq("bucket"))
      .withColumn("pos",
        (col("off") + row_number().over(w) - lit(1)).cast(LongType))
      .select(col("doc_id"), col("pos"))
  }

  private val q112 = Q(
    "q112_global_shuffle",
    (s, dir) =>
      globalShufflePositions(T(s, dir, "documents").select(col("doc_id")))
        .filter(col("doc_id") % 97 === 0)
        .select(col("doc_id"), col("pos"))
        .orderBy(asc_nulls_first("pos")),
    Some("""WITH b AS (
        SELECT doc_id, (doc_id * 1315423911) % 1048573 AS h FROM documents),
      p AS (SELECT doc_id,
              ROW_NUMBER() OVER (ORDER BY h ASC, doc_id ASC) - 1 AS pos
            FROM b)
      SELECT doc_id, pos FROM p WHERE doc_id % 97 = 0
      ORDER BY pos ASC NULLS FIRST"""),
    "reproducible global training-order permutation via range-bucketed hash + distributed per-bucket row_number (no single-partition window)")

  /** q123: ordered funnel analysis (view → click → purchase) — the
    * order-DEPENDENT pattern count no plain aggregation expresses: each
    * later step must happen strictly AFTER the user's earliest qualifying
    * earlier step. Computed as three chained per-user min-timestamp
    * aggregations (t1 = first view; t2 = first click after t1; t3 = first
    * purchase after t2), each a map-combinable conditional min over one
    * user-keyed shuffle — events never self-join, so a user's whole
    * history is never materialized in one row. At 100 TB: three narrow
    * (user_id, ts) aggregations, skew-safe (per-user state is 3
    * timestamps), versus the quadratic event-to-event self-join the
    * naive formulation would plan. */
  private val q123 = Q(
    "q123_funnel",
    (s, dir) => {
      val ev = T(s, dir, "events").select(col("user_id"), col("event_type"), col("ts"))
      val t1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val t2 = ev.filter(col("event_type") === "click")
        .join(t1, Seq("user_id"))
        .filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val t3 = ev.filter(col("event_type") === "purchase")
        .join(t2, Seq("user_id"))
        .filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      val steps = t1.select(lit("1_view").as("step"), col("user_id"))
        .unionByName(t2.select(lit("2_click").as("step"), col("user_id")))
        .unionByName(t3.select(lit("3_purchase").as("step"), col("user_id")))
      steps.groupBy(col("step")).agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(asc_nulls_first("step"))
    },
    Some("""WITH t1 AS (SELECT user_id, min(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
      t2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
               JOIN t1 ON e.user_id = t1.user_id
               WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY e.user_id),
      t3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
               JOIN t2 ON e.user_id = t2.user_id
               WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY e.user_id),
      steps AS (SELECT '1_view' AS step, user_id FROM t1
                UNION ALL SELECT '2_click', user_id FROM t2
                UNION ALL SELECT '3_purchase', user_id FROM t3)
      SELECT step, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM steps GROUP BY step ORDER BY step ASC NULLS FIRST"""),
    "ordered view->click->purchase funnel via chained conditional min-aggs (no event self-join)")

  /** q124: cohort retention — users grouped by FIRST-ACTIVE day, counted
    * on each later active day-offset: the engagement matrix every
    * analytics stack reports. Two user-keyed aggregations (first day,
    * distinct active days) and one join; the cohort matrix is
    * output-sized (days × offsets). At 100 TB the active-day frame is
    * the only corpus-sized stage and it reduces map-side to
    * (user, day) distincts before shuffling. */
  private val q124 = Q(
    "q124_cohort_retention",
    (s, dir) => {
      val ev = T(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val active = ev.distinct()
      val cohort = active.groupBy(col("user_id")).agg(min(col("day")).as("c_day"))
      active.join(cohort, Seq("user_id"))
        .select(date_format(col("c_day"), "yyyy-MM-dd").as("cohort_day"),
          datediff(col("day"), col("c_day")).cast(LongType).as("day_offset"))
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .filter(col("day_offset") <= 7)
        .orderBy(asc_nulls_first("cohort_day"), asc_nulls_first("day_offset"))
    },
    Some("""WITH active AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      cohort AS (SELECT user_id, min(day) AS c_day FROM active GROUP BY user_id)
      SELECT strftime(c_day, '%Y-%m-%d') AS cohort_day,
             CAST(day - c_day AS BIGINT) AS day_offset,
             COUNT(*) AS n_users
      FROM active JOIN cohort USING (user_id)
      WHERE day - c_day <= 7
      GROUP BY 1, 2
      ORDER BY cohort_day ASC NULLS FIRST, day_offset ASC NULLS FIRST"""),
    "cohort retention matrix: first-active-day cohorts x day offsets (distinct-active-day reduction)")

  /** q125: Jaro-Winkler probe search — q89's sibling with the scorer the
    * engine had to BUILD (Spark has no jaro_winkler; `ops/StringSim`
    * adds it as a native codegen expression; DuckDB ships the same
    * textbook algorithm, giving the oracle). Shape: a BOUNDED probe set
    * (every 100th part — the entity-lookup usage) against its brand
    * block, DEDUPE-FIRST (q89's move): JW has no lossless blocking key
    * (unlike lev≤2, a JW threshold admits length skew to ratio 0.65, so
    * length blocks either lose pairs or prune nothing), but the name
    * vocabulary is corpus-bounded, so scoring runs once per distinct
    * (brand, name, name) cell pair on a broadcast-sized frame and two
    * expansion joins recover the row pairs — output-bound, where the
    * row-level probe×block join was quadratic in SF (fixed brand count).
    * Scores round to 4 decimals in BOTH engines before the threshold
    * and ordering (q99's round-before-rank convention). */
  private val q125 = Q(
    "q125_jaro_winkler",
    (s, dir) => {
      // dedupe-first (r8, q89's move): JW scores compute once per distinct
      // (brand, name_a, name_b) cell pair — the name vocabulary is
      // corpus-bounded, so the scorer runs on a ~10^5-row broadcast-sized
      // frame instead of the probe×block row join, whose fixed brand
      // cardinality made it quadratic in SF (sf1 measured 23.5× at 10×
      // rows). Expansion back to (anchor row, row) pairs is output-bound.
      val p = T(s, dir, "part").select(col("p_partkey"), col("p_brand"), col("p_name"))
      val cells = p.select(col("p_brand"), col("p_name")).distinct()
        .withColumn("cv", charVecUdf(col("p_name")))
        .withColumn("len", length(col("p_name")))
      // LOSSLESS JW upper bound from the 36-dim count vectors (q89's
      // prefilter, JW form): Jaro matches are a sub-multiset of the
      // common characters, so m ≤ min(|a|, |b|, (|a|+|b|−L1)/2); with
      // transpositions ≥ 0 and the Winkler boost capped at l = 4,
      // JW ≤ 0.6·(m/|a| + m/|b| + 1)/3 + 0.4. Pairs whose bound is
      // below the 0.93 threshold never reach the O(len²) scorer —
      // which keeps the cell join linear-ish in cells when the name
      // vocabulary grows with the corpus instead of staying fixed.
      // The repartition is q89's: the cell frame is tiny, the per-pair
      // work is not, and AQE would otherwise coalesce to 1-2 tasks.
      val jwBoundUdf = udf((a: Array[Byte], b: Array[Byte], la: Int, lb: Int) => {
        var l1 = 0
        var i = 0
        while (i < 36) { l1 += math.abs(a(i) - b(i)); i += 1 }
        val m = math.min(math.min(la, lb), (la + lb - l1) / 2).toDouble
        if (m <= 0) false
        else 0.6 * (m / la + m / lb + 1.0) / 3.0 + 0.4 >= 0.93
      })
      val cellPairs = cells.select(col("p_brand"), col("p_name").as("name_a"),
          col("cv").as("cv_a"), col("len").as("len_a"))
        .repartition(s.sparkContext.defaultParallelism)
        .join(cells.select(col("p_brand"), col("p_name").as("name_b"),
          col("cv").as("cv_b"), col("len").as("len_b")), Seq("p_brand"))
        .filter(jwBoundUdf(col("cv_a"), col("cv_b"), col("len_a"), col("len_b")))
        .select(col("p_brand"), col("name_a"), col("name_b"),
          round(StringSim.jaroWinkler(col("name_a"), col("name_b")), 4).as("jw"))
        .filter(col("jw") >= 0.93)
      p.filter(col("p_partkey") % 100 === 0)
        .select(col("p_brand"), col("p_name").as("name_a"), col("p_partkey").as("key_a"))
        .join(broadcast(cellPairs), Seq("p_brand", "name_a"))
        .join(p.select(col("p_brand"), col("p_name").as("name_b"),
          col("p_partkey").as("key_b")), Seq("p_brand", "name_b"))
        .filter(col("key_a") =!= col("key_b"))
        .select(col("key_a"), col("key_b"), col("jw"))
        .orderBy(asc_nulls_first("key_a"), asc_nulls_first("key_b"))
    },
    Some("""SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
             round(jaro_winkler_similarity(a.p_name, b.p_name), 4) AS jw
      FROM part a JOIN part b
        ON a.p_brand = b.p_brand AND a.p_partkey <> b.p_partkey
      WHERE a.p_partkey % 100 = 0
        AND round(jaro_winkler_similarity(a.p_name, b.p_name), 4) >= 0.93
      ORDER BY key_a ASC NULLS FIRST, key_b ASC NULLS FIRST"""),
    "Jaro-Winkler probe search on the native codegen expression (bounded probes x brand block; DuckDB ships the oracle scorer)")

  /** q128: CDC latest-row-wins snapshot — the read-side view of a
    * change-stream (the write-side compaction is q108's merge): for each
    * (user, event_type) key the snapshot keeps ONLY the most recent
    * change, deterministically tie-broken by event_id for equal
    * timestamps. One window over one key-partitioned exchange; at 100 TB
    * the same shape runs per key-range partition and the window state is
    * one row. The snapshot is then fingerprinted per event_type (count +
    * decimal sum of live values) to keep the compare frame bounded. */
  private val q128 = Q(
    "q128_cdc_snapshot",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(desc_nulls_last("ts"), desc_nulls_last("event_id"))
      T(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"), col("value"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_keys"),
          sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_live"),
          max(col("event_id")).as("max_event"))
        .orderBy(asc_nulls_first("event_type"))
    },
    Some("""WITH r AS (SELECT user_id, event_type, ts, event_id, value,
               row_number() OVER (PARTITION BY user_id, event_type
                 ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST) AS rn
             FROM events)
      SELECT event_type, COUNT(*) AS n_keys,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_live,
             max(event_id) AS max_event
      FROM r WHERE rn = 1
      GROUP BY event_type ORDER BY event_type ASC NULLS FIRST"""),
    "CDC latest-row-wins snapshot per (user, event_type), deterministic ts+id tie-break (read-side compaction)")

  /** q138: data-quality assertions — the pre-publish audit a pipeline
    * runs on a staging table (Deequ/dbt-test surface): primary-key
    * duplicate rows, null foreign keys, and orphaned foreign keys, each
    * with its violation rate in basis points. The staging table is the
    * driver's (clean) orders with violations PLANTED in-query — every
    * 200th key re-inserted, every 150th custkey nulled, every 170th
    * pointed at a nonexistent customer — so the expected counts are
    * exact and the oracle replays the same construction.
    *
    * Scale shape: the PK check is one count-vs-count-distinct aggregate
    * (map-combinable; at 100 TB swap in HLL — q131 — when ±ε suffices);
    * the orphan check is a left-anti probe of the dimension (broadcast
    * here; bloom-gated — q118 — when the dim doesn't broadcast). One
    * fact scan per check, no fact-fact shuffle. */
  private val q138 = Q(
    "q138_quality_assertions",
    (s, dir) => {
      val base = T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val dirty = base
        .withColumn("o_custkey",
          when(col("o_orderkey") % 150 === 0, lit(null).cast(LongType))
            .when(col("o_orderkey") % 170 === 0, lit(99999999L))
            .otherwise(col("o_custkey")))
        .unionByName(base.filter(col("o_orderkey") % 200 === 0)
          .select(col("o_orderkey"), col("o_custkey")))
      val custKeys = T(s, dir, "customer").select(col("c_custkey"))
      val pk = dirty.agg(count(lit(1)).as("n_rows"),
          (count(lit(1)) - countDistinct(col("o_orderkey"))).as("n_violations"))
        .withColumn("check", lit("pk_duplicate_rows"))
      val fkNull = dirty.agg(count(lit(1)).as("n_rows"),
          sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("n_violations"))
        .withColumn("check", lit("fk_null"))
      val orphan = dirty.filter(col("o_custkey").isNotNull)
        .join(broadcast(custKeys), col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .crossJoin(dirty.agg(count(lit(1)).as("n_rows")))
        .withColumn("check", lit("fk_orphan"))
      pk.unionByName(fkNull).unionByName(orphan.select(col("n_rows"), col("n_violations"), col("check")))
        .select(col("check"), col("n_rows"),
          col("n_violations").cast(LongType).as("n_violations"),
          expr("(10000 * n_violations) div n_rows").as("rate_bp"))
        .orderBy(asc_nulls_first("check"))
    },
    Some("""WITH base AS (SELECT o_orderkey, o_custkey FROM orders),
      dirty AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 150 = 0 THEN NULL
                    WHEN o_orderkey % 170 = 0 THEN 99999999
                    ELSE o_custkey END AS o_custkey
        FROM base
        UNION ALL
        SELECT o_orderkey, o_custkey FROM base WHERE o_orderkey % 200 = 0),
      checks AS (
        SELECT 'pk_duplicate_rows' AS "check", COUNT(*) AS n_rows,
               COUNT(*) - COUNT(DISTINCT o_orderkey) AS n_violations
        FROM dirty
        UNION ALL
        SELECT 'fk_null', COUNT(*),
               SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
        FROM dirty
        UNION ALL
        SELECT 'fk_orphan', (SELECT COUNT(*) FROM dirty),
               COUNT(*) FILTER (WHERE o_custkey IS NOT NULL
                 AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = dirty.o_custkey))
        FROM dirty)
      SELECT "check", CAST(n_rows AS BIGINT) AS n_rows,
             CAST(n_violations AS BIGINT) AS n_violations,
             CAST((10000 * n_violations) // n_rows AS BIGINT) AS rate_bp
      FROM checks
      ORDER BY "check" ASC NULLS FIRST"""),
    "data-quality assertions on a planted-dirty staging table: PK dup rows, null FK, orphan FK with rates (pre-publish audit)")

  /** q139: SCD type-2 temporal join — enrich facts with the dimension
    * version VALID AT the fact's timestamp (point-in-interval join), the
    * standard slowly-changing-dimension read. The versioned dimension is
    * derived in-query from customer: one version before 1998-01-01 and
    * one (renamed segment) after, so orders 1995–2001 genuinely straddle
    * the boundary and each order matches exactly one version.
    *
    * Scale shape: the join condition is EQUALITY on the dimension key
    * plus the interval residual, so Catalyst plans a hash join on
    * c_custkey (broadcast: dims are small) with the interval as a
    * post-join filter — never a nested-loop range join. Aggregation is
    * partial/final on |segments×versions| groups. */
  private val q139 = Q(
    "q139_scd2_join",
    (s, dir) => {
      val cust = T(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
      val dim = cust.select(col("c_custkey"), col("c_mktsegment").as("segment"),
          to_timestamp(lit("1990-01-01")).as("valid_from"),
          to_timestamp(lit("1998-01-01")).as("valid_to"))
        .unionByName(cust.select(col("c_custkey"),
          concat(col("c_mktsegment"), lit("_V2")).as("segment"),
          to_timestamp(lit("1998-01-01")).as("valid_from"),
          to_timestamp(lit("9999-12-31")).as("valid_to")))
      T(s, dir, "orders").select(col("o_custkey"), col("o_orderdate"))
        .join(broadcast(dim), col("o_custkey") === col("c_custkey") &&
          col("o_orderdate") >= col("valid_from") &&
          col("o_orderdate") < col("valid_to"))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_orders"),
          date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("first_day"),
          date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("last_day"))
        .orderBy(asc_nulls_first("segment"))
    },
    Some("""WITH dim AS (
        SELECT c_custkey, c_mktsegment AS segment,
               TIMESTAMP '1990-01-01' AS valid_from, TIMESTAMP '1998-01-01' AS valid_to
        FROM customer
        UNION ALL
        SELECT c_custkey, c_mktsegment || '_V2',
               TIMESTAMP '1998-01-01', TIMESTAMP '9999-12-31'
        FROM customer)
      SELECT segment, COUNT(*) AS n_orders,
             strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_day,
             strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_day
      FROM orders o JOIN dim d
        ON o.o_custkey = d.c_custkey
       AND o.o_orderdate >= d.valid_from AND o.o_orderdate < d.valid_to
      GROUP BY segment
      ORDER BY segment ASC NULLS FIRST"""),
    "SCD type-2 point-in-interval join: facts enriched with the dimension version valid at fact time (hash join on key + interval residual)")

  /** q140: categorical drift audit — how far a column's value
    * distribution moved between a reference window (orders before
    * 1998-01-01) and the current window (after), per monitored column.
    * The metric is total-variation distance in basis points,
    * TVD = ½·Σ|p_v − q_v|: unlike PSI/KL it needs no logarithm, so with
    * bp-floored rates every number is integer-exact across engines (a
    * cross-engine float-`ln` would not be bit-stable). Emits per column
    * the distinct-value count, both window sizes, the worst
    * single-value shift, and the TVD — the drift gate an ML pipeline
    * checks before promoting a new snapshot.
    *
    * Scale shape: one groupBy per monitored column over a shared scan,
    * each |distinct values|-sized; totals broadcast back as one row.
    * Map-combinable throughout; no fact-fact shuffle. */
  private val q140 = Q(
    "q140_segment_drift",
    (s, dir) => {
      val lab = T(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderpriority"),
          (col("o_orderdate") < to_timestamp(lit("1998-01-01"))).as("is_ref"))
      def drift(c: String) = {
        val counts = lab.groupBy(col(c).as("val"))
          .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
            sum(when(col("is_ref"), 0L).otherwise(1L)).as("n_cur"))
        val totals = counts.agg(sum(col("n_ref")).as("ref_n"), sum(col("n_cur")).as("cur_n"))
        counts.crossJoin(broadcast(totals))
          .withColumn("diff_bp",
            abs(expr("(10000 * n_ref) div ref_n") - expr("(10000 * n_cur) div cur_n")))
          .groupBy(lit(c).as("col_name"))
          .agg(count(lit(1)).as("n_values"),
            min(col("ref_n")).as("ref_n"), min(col("cur_n")).as("cur_n"),
            max(col("diff_bp")).as("max_diff_bp"),
            expr("sum(diff_bp) div 2").as("tvd_bp"))
      }
      drift("o_orderstatus").unionByName(drift("o_orderpriority"))
        .orderBy(asc_nulls_first("col_name"))
    },
    Some("""WITH lab AS (
        SELECT o_orderstatus, o_orderpriority,
               (o_orderdate < TIMESTAMP '1998-01-01') AS is_ref
        FROM orders),
      s1 AS (
        SELECT o_orderstatus AS val,
               SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
               SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS n_cur
        FROM lab GROUP BY 1),
      d1 AS (
        SELECT ABS((10000 * n_ref) // rt - (10000 * n_cur) // ct) AS diff_bp, rt, ct
        FROM s1, (SELECT SUM(n_ref) AS rt, SUM(n_cur) AS ct FROM s1)),
      s2 AS (
        SELECT o_orderpriority AS val,
               SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
               SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS n_cur
        FROM lab GROUP BY 1),
      d2 AS (
        SELECT ABS((10000 * n_ref) // rt - (10000 * n_cur) // ct) AS diff_bp, rt, ct
        FROM s2, (SELECT SUM(n_ref) AS rt, SUM(n_cur) AS ct FROM s2)),
      u AS (
        SELECT 'o_orderstatus' AS col_name, COUNT(*) AS n_values,
               MIN(rt) AS ref_n, MIN(ct) AS cur_n,
               MAX(diff_bp) AS max_diff_bp, SUM(diff_bp) // 2 AS tvd_bp
        FROM d1
        UNION ALL
        SELECT 'o_orderpriority', COUNT(*), MIN(rt), MIN(ct),
               MAX(diff_bp), SUM(diff_bp) // 2
        FROM d2)
      SELECT col_name, CAST(n_values AS BIGINT) AS n_values,
             CAST(ref_n AS BIGINT) AS ref_n, CAST(cur_n AS BIGINT) AS cur_n,
             CAST(max_diff_bp AS BIGINT) AS max_diff_bp,
             CAST(tvd_bp AS BIGINT) AS tvd_bp
      FROM u
      ORDER BY col_name ASC NULLS FIRST"""),
    "categorical drift between time windows: per-column total-variation distance in basis points + worst value shift (snapshot promotion gate)")

  /** q141: numeric drift audit — the continuous-column sibling of q140:
    * bucket `o_totalprice` by the REFERENCE window's rank-based decile
    * thresholds (q137's technique: the value at row (k·n) div 10, ties
    * broken by key — integer-exact), assign both windows' rows to those
    * frozen buckets, and report per-bucket rates and shifts in basis
    * points. Freezing the bucket edges on the reference window is what
    * makes the comparison well-defined — re-bucketing each window by its
    * own quantiles would hide exactly the drift being measured. Raw
    * doubles are only COMPARED (never arithmetic), so results are
    * bit-stable across engines.
    *
    * Scale shape: one window pass over the reference slice for the nine
    * thresholds (exact-percentile cost, q76's sketch is the approx
    * sibling), then the 9-element threshold array broadcasts inside a
    * 1-row frame and bucket assignment is a map-side array filter; the
    * final agg is 10 groups. */
  private val q141 = Q(
    "q141_numeric_drift",
    (s, dir) => {
      val lab = T(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice").as("x"),
          (col("o_orderdate") < to_timestamp(lit("1998-01-01"))).as("is_ref"))
      val ranked = lab.filter(col("is_ref"))
        .withColumn("rn", row_number().over(
          Window.orderBy(asc("x"), asc("o_orderkey"))).cast(LongType))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy()))
      val isBoundary = (1 to 9).map(k => col("rn") === expr(s"($k * cnt) div 10"))
        .reduce(_ || _)
      val thr = ranked.filter(isBoundary)
        .agg(sort_array(collect_list(col("x"))).as("ts"))
      val counts = lab.crossJoin(broadcast(thr))
        .select(col("is_ref"),
          (size(expr("filter(ts, t -> x > t)")) + 1).cast(LongType).as("bucket"))
        .groupBy(col("bucket"))
        .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
          sum(when(col("is_ref"), 0L).otherwise(1L)).as("n_cur"))
      val totals = counts.agg(sum(col("n_ref")).as("ref_n"), sum(col("n_cur")).as("cur_n"))
      counts.crossJoin(broadcast(totals))
        .select(col("bucket"), col("n_ref"), col("n_cur"),
          expr("(10000 * n_ref) div ref_n").as("ref_bp"),
          expr("(10000 * n_cur) div cur_n").as("cur_bp"),
          abs(expr("(10000 * n_ref) div ref_n") - expr("(10000 * n_cur) div cur_n")).as("diff_bp"))
        .orderBy(asc_nulls_first("bucket"))
    },
    Some("""WITH lab AS (
        SELECT o_orderkey, o_totalprice AS x,
               (o_orderdate < TIMESTAMP '1998-01-01') AS is_ref
        FROM orders),
      r AS (
        SELECT x, row_number() OVER (ORDER BY x ASC, o_orderkey ASC) AS rn,
               COUNT(*) OVER () AS cnt
        FROM lab WHERE is_ref),
      thr AS (
        SELECT list_sort(list(x)) AS ts FROM r
        WHERE rn IN ((1*cnt)//10, (2*cnt)//10, (3*cnt)//10, (4*cnt)//10,
                     (5*cnt)//10, (6*cnt)//10, (7*cnt)//10, (8*cnt)//10, (9*cnt)//10)),
      b AS (
        SELECT is_ref, 1 + len(list_filter(ts, t -> x > t)) AS bucket
        FROM lab, thr),
      c AS (
        SELECT bucket,
               SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
               SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS n_cur
        FROM b GROUP BY bucket),
      t AS (SELECT SUM(n_ref) AS ref_n, SUM(n_cur) AS cur_n FROM c)
      SELECT CAST(bucket AS BIGINT) AS bucket,
             CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
             CAST((10000 * n_ref) // ref_n AS BIGINT) AS ref_bp,
             CAST((10000 * n_cur) // cur_n AS BIGINT) AS cur_bp,
             CAST(ABS((10000 * n_ref) // ref_n - (10000 * n_cur) // cur_n) AS BIGINT) AS diff_bp
      FROM c, t
      ORDER BY bucket ASC NULLS FIRST"""),
    "numeric drift: current window bucketed by the reference window's frozen rank-based deciles, per-bucket bp rates and shifts (continuous sibling of q140)")

  /** q152: robust outlier audit — per-source median and MAD (median
    * absolute deviation) of document length, flagging rows beyond
    * 3·MAD. The robust sibling of mean±k·σ (one planted outlier drags a
    * mean/σ gate, never a median/MAD gate) and of q137 (which CLAMPS at
    * rank percentiles; this FLAGS at a robust distance). Lower-median
    * convention: the value at rank (n+1) div 2 with doc_id tie-break —
    * every number is an integer compare on BIGINTs, exact across engines
    * (the q141/q137 rank-boundary doctrine).
    *
    * Scale shape: two per-SOURCE window passes (rank within source — the
    * partition is a source, never the corpus) + a source-cardinality
    * median/MAD frame broadcast back; the final agg is source-sized. At
    * 100 TB swap the exact per-source rank for q76's GK sketch per group
    * if a single source outgrows a partition set. */
  private val q152 = Q(
    "q152_mad_outliers",
    (s, dir) => {
      val x = T(s, dir, "documents").select(col("source"), col("doc_id"), col("n_chars"))
      def groupMedian(df: org.apache.spark.sql.DataFrame, valueCol: String) = df
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("source")).orderBy(asc(valueCol), asc("doc_id"))).cast(LongType))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("source"))))
        .filter(col("rn") === expr("(cnt + 1) div 2"))
      val med = groupMedian(x, "n_chars").select(col("source"), col("n_chars").as("med"))
      val dev = x.join(broadcast(med), "source")
        .withColumn("dev", abs(col("n_chars") - col("med")))
      val mad = groupMedian(dev.select(col("source"), col("doc_id"), col("dev")), "dev")
        .select(col("source"), col("dev").as("mad"))
      dev.join(broadcast(mad), "source")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), min(col("med")).as("med_chars"),
          min(col("mad")).as("mad_chars"),
          sum(when(col("dev") > col("mad") * 3, 1L).otherwise(0L)).as("n_outliers"))
        .select(col("source"), col("n_docs"), col("med_chars"), col("mad_chars"),
          col("n_outliers"), expr("(10000 * n_outliers) div n_docs").as("outlier_bp"))
        .orderBy(asc_nulls_first("source"))
    },
    Some("""WITH x AS (SELECT source, doc_id, n_chars FROM documents),
      r1 AS (SELECT source, doc_id, n_chars,
              ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars ASC, doc_id ASC) AS rn,
              COUNT(*) OVER (PARTITION BY source) AS cnt FROM x),
      med AS (SELECT source, n_chars AS med FROM r1 WHERE rn = (cnt + 1) // 2),
      d AS (SELECT x.source, x.doc_id, abs(x.n_chars - med.med) AS dev, med.med
            FROM x JOIN med USING (source)),
      r2 AS (SELECT source, doc_id, dev, med,
              ROW_NUMBER() OVER (PARTITION BY source ORDER BY dev ASC, doc_id ASC) AS rn,
              COUNT(*) OVER (PARTITION BY source) AS cnt FROM d),
      mad AS (SELECT source, dev AS mad FROM r2 WHERE rn = (cnt + 1) // 2)
      SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(MIN(d.med) AS BIGINT) AS med_chars,
             CAST(MIN(mad.mad) AS BIGINT) AS mad_chars,
             CAST(SUM(CASE WHEN d.dev > 3 * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
             CAST((10000 * SUM(CASE WHEN d.dev > 3 * mad.mad THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT) AS outlier_bp
      FROM d JOIN mad USING (source)
      GROUP BY d.source ORDER BY source ASC NULLS FIRST"""),
    "per-source median/MAD length outliers at 3*MAD, rank-exact integers (robust data-QA sibling of q137's winsorization)")

  /** q157: weighted systematic (probability-proportional-to-size)
    * sampling — the deterministic way to MATERIALIZE a sampling rate the
    * mixture stages (q150 temperature rates, q134 token budgets) decide:
    * lay every document's weight end-to-end on a number line (cumulative
    * starts in doc_id order), then take k equally-spaced midpoint probes
    * pᵢ = ((2i+1)·W) div (2k); the document whose [cs, cs+wt) interval
    * contains pᵢ is sample i. Unlike Bernoulli/Poisson sampling the
    * output size is EXACTLY k, every ≥W/k-weight document is guaranteed
    * in (stratified-by-position, low-discrepancy), and the result is
    * reproducible on any cluster — all integer arithmetic.
    *
    * Scale shape: the corpus-wide cumulative sum uses q112's two-level
    * trick — per-bucket totals (one narrow groupBy) prefix-summed in a
    * bucket-count-sized broadcast window, plus a per-bucket running sum
    * whose window is PARTITIONED by bucket — no single-partition window
    * ever exists. The k probes are a one-row-derived broadcast; interval
    * containment is evaluated map-side against each doc row (a
    * BroadcastNestedLoopJoin of k rows), so the whole operator adds one
    * narrow shuffle over (bucket, long) pairs to the scan. */
  def weightedSystematicSample(docs: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = {
    val base = docs.select(col("doc_id"), col("n_chars").cast(LongType).as("wt"))
      .withColumn("bucket", expr("doc_id div 64"))
    val offs = base.groupBy(col("bucket")).agg(sum(col("wt")).as("bw"))
      .withColumn("off",
        coalesce(sum(col("bw")).over(
          Window.orderBy(asc("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val cum = base.join(broadcast(offs.select(col("bucket"), col("off"))), Seq("bucket"))
      .withColumn("cs", col("off") + coalesce(
        sum(col("wt")).over(
          Window.partitionBy(col("bucket")).orderBy(asc("doc_id"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val picks = offs.agg(sum(col("bw")).as("tot"))
      .select(explode(expr(s"sequence(0, ${k - 1})")).as("i"), col("tot"))
      .select(col("i").cast(LongType).as("sample_i"),
        expr(s"((2 * i + 1) * tot) div ${2 * k}").as("p"))
    cum.join(broadcast(picks), col("p") >= col("cs") && col("p") < col("cs") + col("wt"))
      .select(col("sample_i"), col("doc_id"), col("wt"))
      .orderBy(asc_nulls_first("sample_i"))
  }

  private val q157 = Q(
    "q157_weighted_systematic_sample",
    (s, dir) => weightedSystematicSample(T(s, dir, "documents"), 37),
    Some("""WITH w AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS wt FROM documents),
      c AS (SELECT doc_id, wt,
              COALESCE(SUM(wt) OVER (ORDER BY doc_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cs
            FROM w),
      t AS (SELECT CAST(SUM(wt) AS BIGINT) AS tot FROM w),
      picks AS (SELECT unnest(generate_series(0, 36)) AS i),
      p AS (SELECT i, ((2 * i + 1) * tot) // 74 AS p FROM picks, t)
      SELECT CAST(p.i AS BIGINT) AS sample_i, c.doc_id, c.wt
      FROM p JOIN c ON p.p >= c.cs AND p.p < c.cs + c.wt
      ORDER BY sample_i ASC NULLS FIRST"""),
    "exact-k PPS systematic sample: two-level integer cumsum + k broadcast midpoint probes (deterministic mixture materialization)")

  /** q158: SCD2 history BUILD from a change log — the write-side twin of
    * q139's point-in-time read: given per-entity state observations
    * (user_id, ts, event_type), collapse consecutive identical states and
    * emit versioned validity intervals [valid_from, valid_to) with an
    * is_current flag — the job that maintains the dimension q139 joins
    * against, fed in production by q128's CDC feed.
    *
    * Scale shape: ONE shuffle on the entity key feeds every window pass —
    * lag (change detection), row_number (version), and lead (interval
    * close) all share PARTITION BY user_id ORDER BY ts, event_id, so
    * Catalyst plans a single exchange + sort and runs the three window
    * functions over it; per-key state is one row. No entity's history
    * ever concentrates in one partition beyond its own rows (per-user
    * cardinality-bounded, the q123 skew argument). Total order is pinned
    * by the (ts, event_id) tie-break. */
  private val q158 = Q(
    "q158_scd2_build",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(asc("ts"), asc("event_id"))
      val changes = T(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      val w2 = Window.partitionBy(col("user_id")).orderBy(asc("ts"), asc("event_id"))
      changes
        .withColumn("version", row_number().over(w2).cast(LongType))
        .withColumn("valid_to_ts", lead(col("ts"), 1).over(w2))
        .select(col("user_id"), col("version"), col("event_type").as("state"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
          coalesce(date_format(col("valid_to_ts"), "yyyy-MM-dd HH:mm:ss"),
            lit("9999-12-31 00:00:00")).as("valid_to"),
          col("valid_to_ts").isNull.as("is_current"))
        .filter(col("user_id") % 10 === 0)
        .orderBy(asc_nulls_first("user_id"), asc_nulls_first("version"))
    },
    Some("""WITH c AS (SELECT user_id, ts, event_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts ASC, event_id ASC) AS prev
             FROM events),
      ch AS (SELECT user_id, ts, event_id, event_type FROM c
             WHERE prev IS NULL OR prev <> event_type),
      v AS (SELECT user_id, ts, event_type,
              ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY ts ASC, event_id ASC) AS version,
              lead(ts) OVER (PARTITION BY user_id
                ORDER BY ts ASC, event_id ASC) AS valid_to_ts
            FROM ch)
      SELECT user_id, CAST(version AS BIGINT) AS version, event_type AS state,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
             COALESCE(strftime(valid_to_ts, '%Y-%m-%d %H:%M:%S'),
                      '9999-12-31 00:00:00') AS valid_to,
             valid_to_ts IS NULL AS is_current
      FROM v WHERE user_id % 10 = 0
      ORDER BY user_id ASC NULLS FIRST, version ASC NULLS FIRST"""),
    "SCD2 dimension build from a change log: collapse no-change rows, versioned [from,to) intervals, one entity-keyed exchange for all three windows")

  /** q159: recency-weighted (exponentially decayed) engagement score —
    * the freshness weighting every ranking/feed/data-valuation pipeline
    * applies, kept EXACT: instead of float `exp(-λ·age)`, the decay is a
    * power-of-two halving per age bucket (one halving per 7 days here),
    * so the weight is a bit-shift divide — `cents div (1 << bucket)` —
    * and Spark and the oracle agree bit-for-bit (the q150 no-`pow` rule;
    * IEEE `value*100` is exact-rounded so the floor to cents matches
    * too). Ages are integer µs differences floored to days — no calendar
    * functions, no timezone surface.
    *
    * Scale shape: the reference timestamp is a one-row broadcast; decay
    * is map-side arithmetic on the scan; the only shuffle is the
    * map-combinable per-user sum (partial aggregation pushes the data
    * down to one row per user per task before the exchange). */
  private val q159 = Q(
    "q159_decayed_engagement",
    (s, dir) => {
      val ev = T(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      val ref = ev.agg(max(col("us")).as("ref_us"))
      ev.crossJoin(broadcast(ref))
        .withColumn("cents", floor(col("value") * 100).cast(LongType))
        // clamp: Java << wraps the shift amount mod 64 (bucket 64 would
        // divide by 1, bucket 63 by a NEGATIVE 2^63) while DuckDB does
        // not — and cents < 2^40, so every bucket ≥ 40 decays to 0
        // anyway; least(bucket, 62) keeps both engines exact and equal
        .withColumn("bucket", expr("least(((ref_us - us) div 86400000000L) div 7, 62L)"))
        .withColumn("decayed", expr("cents div shiftleft(1L, cast(bucket AS int))"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("cents")).as("raw_cents"),
          sum(col("decayed")).as("decayed_cents"))
        .withColumn("retention_bp", expr("(10000 * decayed_cents) div raw_cents"))
        .orderBy(asc_nulls_first("user_id"))
    },
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
      r AS (SELECT MAX(us) AS ref_us FROM e),
      d AS (SELECT user_id,
              CAST(FLOOR(value * 100) AS BIGINT) AS cents,
              LEAST(((r.ref_us - us) // 86400000000) // 7, 62) AS bucket
            FROM e, r)
      SELECT user_id, COUNT(*) AS n_events,
             CAST(SUM(cents) AS BIGINT) AS raw_cents,
             CAST(SUM(cents // (CAST(1 AS BIGINT) << bucket)) AS BIGINT)
               AS decayed_cents,
             CAST((10000 * SUM(cents // (CAST(1 AS BIGINT) << bucket)))
               // SUM(cents) AS BIGINT) AS retention_bp
      FROM d GROUP BY user_id ORDER BY user_id ASC NULLS FIRST"""),
    "exponential recency decay as exact bit-shift halvings per age bucket; map-side decay + one map-combinable per-user sum")

  /** q166: grouped 2-D skyline (Pareto frontier) — per event type, the
    * events no later event of that type matched-or-beat on value: the
    * dominance query behind "keep the frontier" selections (freshest ×
    * highest-quality sample retention, best-price-since monitors). The
    * sort-based algorithm: reduce to one row per (type, ts) with a
    * distributed groupBy, then a running max over descending time —
    * a row is on the frontier iff it strictly beats every later row's
    * best. The window PARTITIONs BY event_type, so the pass is fully
    * parallel (no global sort), and it runs on the GROUPED frame —
    * |distinct (type, ts)| rows, the reduced domain, not raw events.
    *
    * The oracle is deliberately a DIFFERENT algorithm: the declarative
    * NOT EXISTS dominance definition, so the hash match checks the
    * sort+cummax rewrite against first principles rather than replaying
    * it. Value is scored in exact cents (DECIMAL×100 → BIGINT, the
    * [[graft.Q]] convention), timestamps as epoch micros. */
  private val q166 = Q(
    "q166_skyline",
    (s, dir) => {
      val g = T(s, dir, "events")
        .select(col("event_type"), unix_micros(col("ts")).as("ts_us"),
          (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"))
        .groupBy(col("event_type"), col("ts_us"))
        .agg(max(col("cents")).as("cents"))
      val later = Window.partitionBy(col("event_type")).orderBy(desc("ts_us"))
        .rowsBetween(Window.unboundedPreceding, -1)
      g.withColumn("best_later", max(col("cents")).over(later))
        .filter(col("best_later").isNull || col("cents") > col("best_later"))
        .select(col("event_type"), col("ts_us"), col("cents"))
        .orderBy(asc_nulls_first("event_type"), asc_nulls_first("ts_us"))
    },
    Some("""WITH e AS (SELECT event_type, epoch_us(ts) AS ts_us,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
             FROM events),
      g AS (SELECT event_type, ts_us, MAX(cents) AS cents
            FROM e GROUP BY event_type, ts_us)
      SELECT event_type, ts_us, cents
      FROM g a
      WHERE NOT EXISTS (SELECT 1 FROM g b
              WHERE b.event_type = a.event_type
                AND b.ts_us > a.ts_us AND b.cents >= a.cents)
      ORDER BY event_type ASC NULLS FIRST, ts_us ASC NULLS FIRST"""),
    "grouped 2-D skyline via partitioned sort + running max over the reduced domain; oracle is the declarative NOT-EXISTS dominance definition (different algorithm)")

  /** q167: null-aware anti join — NOT IN vs NOT EXISTS under SQL
    * three-valued logic, side by side on the same probe/sub pair. The
    * probe carries planted NULL keys (every 100th customer); `k NOT IN
    * (sub)` is NULL (filtered) for those rows while `NOT EXISTS` keeps
    * them, so the two counts differ by exactly the planted-null count —
    * the classic silent-row-loss trap in dedup/exclusion pipelines. The
    * subquery side is guarded `IS NOT NULL` (one NULL there makes NOT IN
    * universally false and the whole result empty — documented, not
    * exercised: the driver data has no null o_custkey).
    *
    * Scale shape: Spark plans the NOT IN branch as a BROADCAST null-aware
    * anti join (the only execution strategy for it — plan-gated in
    * PlanShapeSpec); the sub side is a distinct key set, naturally
    * bounded. The NOT EXISTS branch is an ordinary left_anti that can
    * shuffle when the key set outgrows broadcast. */
  private val q167 = Q(
    "q167_null_aware_anti",
    (s, dir) => {
      val probe = T(s, dir, "customer").select(
        when(col("c_custkey") % 100 === 0, lit(null)).otherwise(col("c_custkey")).as("k"),
        col("c_mktsegment").as("segment"))
      val sub = T(s, dir, "orders")
        .filter(col("o_orderstatus") === "F" && col("o_custkey").isNotNull)
        .select(col("o_custkey").as("ck")).distinct()
      probe.createOrReplaceTempView("naaj_probe")
      sub.createOrReplaceTempView("naaj_sub")
      val notIn = s.sql(
          "SELECT segment FROM naaj_probe WHERE k NOT IN (SELECT ck FROM naaj_sub)")
        .groupBy(col("segment")).agg(count(lit(1)).as("n_not_in"))
      val notExists = probe.join(sub, col("k") === col("ck"), "left_anti")
        .groupBy(col("segment")).agg(count(lit(1)).as("n_not_exists"))
      probe.groupBy(col("segment")).agg(count(lit(1)).as("n_customers"))
        .join(notIn, Seq("segment")).join(notExists, Seq("segment"))
        .orderBy(asc_nulls_first("segment"))
    },
    Some("""WITH probe AS (
        SELECT CASE WHEN c_custkey % 100 = 0 THEN NULL ELSE c_custkey END AS k,
               c_mktsegment AS segment
        FROM customer),
      sub AS (SELECT DISTINCT o_custkey AS ck FROM orders
              WHERE o_orderstatus = 'F' AND o_custkey IS NOT NULL)
      SELECT segment, COUNT(*) AS n_customers,
             CAST(COUNT(*) FILTER (WHERE k NOT IN (SELECT ck FROM sub)) AS BIGINT)
               AS n_not_in,
             CAST(COUNT(*) FILTER (WHERE NOT EXISTS
               (SELECT 1 FROM sub WHERE sub.ck = probe.k)) AS BIGINT)
               AS n_not_exists
      FROM probe GROUP BY segment
      ORDER BY segment ASC NULLS FIRST"""),
    "NOT IN (null-aware anti join, planned broadcast) vs NOT EXISTS (left_anti) on a null-planted probe: the counts differ by exactly the NULL keys (three-valued-logic trap)")

  /** q169: DAU + cumulative distinct users per day — the growth metric
    * every event pipeline reports. Cumulative COUNT(DISTINCT) has no
    * distributed window form, so it is rewritten as first-seen events:
    * min(day) per user (one user-keyed aggregate), new-user counts per
    * day, then a running sum over the DAY spine — the window runs on
    * |distinct days| rows (bounded domain: time, not data, sized — same
    * argument as q166's frontier pass). The oracle computes both metrics
    * declaratively (correlated COUNT(DISTINCT) per day), a genuinely
    * different algorithm, so the hash match checks the first-seen rewrite
    * itself. */
  private val q169 = Q(
    "q169_cumulative_distinct",
    (s, dir) => {
      val e = T(s, dir, "events")
        .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
      val dau = e.distinct().groupBy(col("day")).agg(count(lit(1)).as("dau"))
      val firsts = e.groupBy(col("user_id")).agg(min(col("day")).as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("n_new"))
      val spine = Window.orderBy(asc("day"))
        .rowsBetween(Window.unboundedPreceding, 0)
      dau.join(firsts, Seq("day"), "left")
        .withColumn("cum_users", sum(coalesce(col("n_new"), lit(0L))).over(spine))
        .select(col("day"), col("dau"), col("cum_users"))
        .orderBy(asc_nulls_first("day"))
    },
    Some("""WITH d AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day FROM events)
      SELECT day,
             CAST((SELECT COUNT(DISTINCT user_id) FROM events e
                   WHERE strftime(e.ts, '%Y-%m-%d') = d.day) AS BIGINT) AS dau,
             CAST((SELECT COUNT(DISTINCT user_id) FROM events e
                   WHERE strftime(e.ts, '%Y-%m-%d') <= d.day) AS BIGINT) AS cum_users
      FROM d ORDER BY day ASC NULLS FIRST"""),
    "DAU + cumulative distinct users via the first-seen rewrite (no cumulative DISTINCT window exists); oracle recomputes both correlated-declaratively")

  /** q171: CUSUM change-point detection on the monthly revenue series —
    * the classic drift alarm (Page 1954): s_m = max(0, s_{m−1} + x_m − k)
    * with reference k = mean monthly cents (integer div) and alarm when
    * s_m exceeds h = k/2. The recurrence looks inherently sequential, but
    * the engine computes it CLOSED-FORM: s_m = Y_m − min(0, min_{j≤m} Y_j)
    * with Y = cumsum(x − k) — two windows over the month spine, no
    * iteration. All arithmetic in exact integer cents, so both engines
    * agree bit-for-bit.
    *
    * Scale shape: the monthly reduction is a distributed partial/final
    * aggregate; the window pass runs on |months| rows — bounded domain
    * (time-sized, not data-sized, same argument as q166/q169). The
    * oracle replays the RECURRENCE itself through a recursive CTE — a
    * genuinely different algorithm, so the hash match proves the
    * prefix-min identity, not just the arithmetic. */
  private val q171 = Q(
    "q171_cusum_changepoint",
    (s, dir) => {
      val m = T(s, dir, "orders")
        .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
          (dec("o_totalprice") * 100).cast(LongType).as("cents"))
        .groupBy(col("month")).agg(sum(col("cents")).as("x"))
      val k = m.agg(expr("sum(x) div count(1)").as("k"))
      val w = Window.orderBy(asc("month"))
      m.crossJoin(broadcast(k))
        .withColumn("y", sum(col("x") - col("k")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("runmin", min(col("y")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("cusum", col("y") - least(col("runmin"), lit(0L)))
        .select(col("month"), col("x").as("x_cents"), col("cusum").as("cusum_cents"),
          (col("cusum") > expr("k div 2")).cast(LongType).as("alarm"))
        .orderBy(asc_nulls_first("month"))
    },
    Some("""WITH RECURSIVE m AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS x
        FROM orders GROUP BY 1),
      kk AS (SELECT CAST(SUM(x) // COUNT(*) AS BIGINT) AS k FROM m),
      o AS (SELECT month, x, ROW_NUMBER() OVER (ORDER BY month ASC) AS i FROM m),
      r AS (SELECT CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS s
            UNION ALL
            SELECT o.i, GREATEST(CAST(0 AS BIGINT), r.s + o.x - (SELECT k FROM kk))
            FROM r JOIN o ON o.i = r.i + 1)
      SELECT o.month, o.x AS x_cents, r.s AS cusum_cents,
             CAST(r.s > (SELECT k FROM kk) // 2 AS BIGINT) AS alarm
      FROM r JOIN o ON o.i = r.i
      ORDER BY month ASC NULLS FIRST"""),
    "CUSUM drift alarm in exact integer cents: engine uses the closed-form prefix-min identity (two windows, no iteration); oracle replays the recurrence via recursive CTE")

  /** q172: OR-predicate join decomposed into a union of equi-joins — the
    * rewrite that keeps entity-resolution joins (match on primary key OR
    * a recovered/alternate key) off the nested-loop path. A naive
    * `a JOIN b ON k1 = x OR k2 = x` has no single equi-key, so Spark
    * plans a broadcast nested loop — O(|a|·|b|) comparisons. The engine
    * runs one hash join PER disjunct and set-unions the pair results
    * (distinct on the pair key dedups rows matching both arms), which is
    * the textbook OR-expansion; the plan gate asserts no nested loop
    * survives. NULL alternate keys drop out of the equi-join naturally —
    * matching the OR's three-valued semantics (NULL = no match).
    *
    * Scale shape: each disjunct is an independent broadcast/shuffle hash
    * join; the distinct runs on (orderkey, custkey) pairs, bounded by
    * the join output, not the input product. */
  private val q172 = Q(
    "q172_or_join_rewrite",
    (s, dir) => {
      val o = T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        when(col("o_orderkey") % 7 === 0, col("o_orderkey") % 1500).as("alt_key"))
      val c = T(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
      val byPrimary = o.join(c, col("o_custkey") === col("c_custkey"))
      val byAlt = o.join(c, col("alt_key") === col("c_custkey"))
      byPrimary.select(col("o_orderkey"), col("c_custkey"), col("c_mktsegment"))
        .unionByName(byAlt.select(col("o_orderkey"), col("c_custkey"), col("c_mktsegment")))
        .distinct()
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy(asc_nulls_first("segment"))
    },
    Some("""WITH o AS (SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey % 7 = 0 THEN o_orderkey % 1500 END AS alt_key
             FROM orders),
      pairs AS (SELECT DISTINCT o.o_orderkey, c.c_custkey, c.c_mktsegment
                FROM o JOIN customer c
                  ON o.o_custkey = c.c_custkey OR o.alt_key = c.c_custkey)
      SELECT c_mktsegment AS segment, COUNT(*) AS n_pairs,
             CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
      FROM pairs GROUP BY 1
      ORDER BY segment ASC NULLS FIRST"""),
    "OR-predicate join as a union of equi-joins + pair distinct (no nested loop, plan-gated); oracle runs the literal OR join")

  /** q175: weighted median — the revenue-weighted median quantity per
    * return flag (the "what order size carries half the money" statistic;
    * plain median ignores that a 50-unit line weighs more than a 1-unit
    * line). Definition: the smallest x whose cumulative weight (peers
    * included) reaches half the total — all integer-cent arithmetic. The
    * engine pre-reduces to one row per (group, x) with a distributed
    * aggregate, then one group-keyed window pass with RANGE framing
    * (peers must count together or ties break the definition); the
    * oracle states the definition correlated-declaratively over the same
    * reduced frame — no window, different algorithm. */
  private val q175 = Q(
    "q175_weighted_median",
    (s, dir) => {
      val t = T(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          col("l_quantity").cast(LongType).as("qty"),
          (dec("l_extendedprice") * 100).cast(LongType).as("cents"))
        .groupBy(col("flag"), col("qty")).agg(sum(col("cents")).as("w"))
      val byQty = Window.partitionBy(col("flag")).orderBy(asc("qty"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val total = Window.partitionBy(col("flag"))
      t.withColumn("cw", sum(col("w")).over(byQty))
        .withColumn("tw", sum(col("w")).over(total))
        .filter(col("cw") * 2 >= col("tw"))
        .groupBy(col("flag")).agg(min(col("qty")).as("w_median_qty"))
        .orderBy(asc_nulls_first("flag"))
    },
    Some("""WITH t AS (
        SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS qty,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS w
        FROM lineitem GROUP BY 1, 2)
      SELECT flag, MIN(qty) AS w_median_qty
      FROM t a
      WHERE 2 * (SELECT SUM(w) FROM t b WHERE b.flag = a.flag AND b.qty <= a.qty)
            >= (SELECT SUM(w) FROM t b WHERE b.flag = a.flag)
      GROUP BY flag
      ORDER BY flag ASC NULLS FIRST"""),
    "revenue-weighted median quantity: distributed (group, x) reduction + one RANGE-framed window pass; oracle states the half-weight definition correlated-declaratively")

  /** q176: market-basket co-occurrence — part pairs appearing together
    * in ≥ 2 orders, the support-counting kernel of frequent-itemset
    * mining (and of co-citation / co-click analytics). The self-join is
    * keyed on the basket id, so both sides shuffle ONCE on l_orderkey
    * and pairs generate inside each co-partition; the `<` ordering halves
    * the pair space and canonicalizes (a,b). Per-basket fan-out is
    * quadratic in basket size — capped at `maxBasket` items per basket
    * (deterministic row_number ≤ K, lowest part keys win — the q133
    * pattern) so a pathological basket cannot explode a partition: the
    * per-basket fan-out ceiling is K(K−1)/2 regardless of input. The
    * default 256 is far above any fixture basket (TPC-H ≤ 7 lines), so
    * the cap is answer-identical under the oracle while bounding the
    * 100 TB worst case; the window's hash(ok) partitioning is the same
    * the self-join needs, so the cap costs one per-partition sort, not
    * an extra exchange. */
  /** q176's pair kernel on an (ok, pk) basket frame — exposed so
    * AqeSkewJoinSpec can drive the IDENTICAL join shape with a planted
    * hot basket (a pathological order whose quadratic pair fan-out lands
    * in one shuffle partition on both sides of the self-join) and prove
    * both defenses: the AQE skew split (maxBasket = Int.MaxValue) and
    * the basket cap (default). */
  def cooccurrencePairs(l: DataFrame, maxBasket: Int = 256): DataFrame = {
    val capped =
      if (maxBasket == Int.MaxValue) l
      else l.withColumn("rn",
          row_number().over(Window.partitionBy(col("ok")).orderBy(asc("pk"))))
        .filter(col("rn") <= maxBasket).drop("rn")
    val pairs = capped.join(capped.select(col("ok"), col("pk").as("pk2")), Seq("ok"))
      .filter(col("pk") < col("pk2"))
    pairs.groupBy(col("pk").as("part_a"), col("pk2").as("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 2)
      .orderBy(desc("n_orders"), asc_nulls_first("part_a"), asc_nulls_first("part_b"))
  }

  private val q176 = Q(
    "q176_cooccurrence",
    (s, dir) => cooccurrencePairs(
      T(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()),
    Some("""WITH l AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem)
      SELECT a.pk AS part_a, b.pk AS part_b, COUNT(*) AS n_orders
      FROM l a JOIN l b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
      ORDER BY n_orders DESC NULLS LAST, part_a ASC NULLS FIRST, part_b ASC NULLS FIRST"""),
    "frequent-pair support counting: basket-keyed self-join (one shuffle, canonicalized pairs), min-support filter; per-basket fan-out bounded")

  /** q177: first-order transition matrix over the event stream — for
    * each user, the NEXT event type via lead() on one user-keyed window,
    * then (from, to) counts and per-from rates in basis points (integer
    * div — no float). This is the Markov-chain summary behind funnel
    * diagnostics and session modeling. `lead` orders by (ts, event_id)
    * so colliding per-user timestamps cannot make it nondeterministic,
    * and the oracle mirrors the SAME tie-break through a different
    * mechanism — ROW_NUMBER over (ts_us, event_id) and an rn+1
    * self-join (the successor is the next row in that total order) —
    * so both engines stay hash-identical even on a fixture with ties.
    * The rn+1 equi-join keeps the oracle LINEAR per user; the earlier
    * correlated min-of-later-rows form went quadratic on the skew
    * fixture's 23k-event hot user (DuckDB could not decorrelate the
    * row-value comparison) and timed out the gate. */
  private val q177 = Q(
    "q177_transition_matrix",
    (s, dir) => {
      val e = T(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("event_type"))
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(asc("ts_us"), asc("event_id"))
      val trans = e.withColumn("to_type", lead(col("event_type"), 1).over(byUser))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      trans.withColumn("rate_bp",
          expr("(10000 * n) div sum(n) over (partition by from_type)"))
        .select(col("from_type"), col("to_type"), col("n"), col("rate_bp"))
        .orderBy(asc_nulls_first("from_type"), asc_nulls_first("to_type"))
    },
    Some("""WITH e AS (SELECT user_id, event_type,
                ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts) ASC, event_id ASC) AS rn
              FROM events),
      t AS (SELECT a.event_type AS from_type, b.event_type AS to_type, COUNT(*) AS n
            FROM e a JOIN e b ON b.user_id = a.user_id AND b.rn = a.rn + 1
            GROUP BY 1, 2)
      SELECT from_type, to_type, n,
             CAST((10000 * n) // (SELECT SUM(n) FROM t t2 WHERE t2.from_type = t.from_type) AS BIGINT)
               AS rate_bp
      FROM t
      ORDER BY from_type ASC NULLS FIRST, to_type ASC NULLS FIRST"""),
    "Markov transition matrix: lead() on one user-keyed window, per-from rates in integer bp; oracle pairs successors via a tie-broken row_number rn+1 self-join")

  /** q178: OLS trend line over the monthly revenue series — the
    * least-squares slope every dashboard's "trend" arrow computes, done
    * in EXACT integer arithmetic: with x = month index and y = monthly
    * cents, slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²). Numerator and
    * denominator are emitted exactly; the quotient is quantized to
    * micro-cents/month SIGN-SAFELY — `(10⁶·|num|) div den` then
    * re-signed — because Spark `div` truncates toward zero while DuckDB
    * `//` floors, and they only agree on non-negative operands (the
    * repo-wide convention). The 10⁶·num product exceeds int64, so it
    * runs in DECIMAL(38,0) ↔ HUGEINT.
    *
    * Scale shape: the monthly reduction is distributed; the five OLS
    * sums are ONE map-combinable aggregate over the |months| spine. */
  private val q178 = Q(
    "q178_trend_ols",
    (s, dir) => {
      val m = T(s, dir, "orders")
        .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
          (dec("o_totalprice") * 100).cast(LongType).as("cents"))
        .groupBy(col("month")).agg(sum(col("cents")).as("y"))
      val w = Window.orderBy(asc("month"))
      m.withColumn("x", row_number().over(w).cast(LongType))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sx2"))
        .select(col("n"),
          (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
          (col("n") * col("sx2") - col("sx") * col("sx")).as("slope_den"))
        .withColumn("slope_microcents",
          expr("""CASE WHEN slope_num < 0 THEN -1 ELSE 1 END *
                  CAST(floor((CAST(1000000 AS DECIMAL(38,0)) * abs(slope_num)) / slope_den) AS BIGINT)"""))
    },
    Some("""WITH m AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS y
        FROM orders GROUP BY 1),
      o AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY month ASC) AS BIGINT) AS x, y FROM m),
      agg AS (SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
                     CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x*y) AS BIGINT) AS sxy,
                     CAST(SUM(x*x) AS BIGINT) AS sx2 FROM o)
      SELECT n, CAST(n*sxy - sx*sy AS BIGINT) AS slope_num,
             CAST(n*sx2 - sx*sx AS BIGINT) AS slope_den,
             CAST(CASE WHEN n*sxy - sx*sy < 0 THEN -1 ELSE 1 END *
                  ((CAST(1000000 AS HUGEINT) * abs(n*sxy - sx*sy)) // (n*sx2 - sx*sx)) AS BIGINT)
               AS slope_microcents
      FROM agg"""),
    "integer-exact OLS revenue trend: one map-combinable aggregate over the month spine; sign-safe micro-cents quantization (div/floor parity), DECIMAL(38,0)↔HUGEINT product")

  /** q180: Benford first-digit audit — the fraud/data-quality screen:
    * does the leading digit of order totals follow log10(1+1/d)? The
    * expected rates are the nine textbook constants inlined in BASIS
    * POINTS (no runtime logarithm — cross-engine float log is not
    * bit-stable), observed rates are integer-div bp, deviation is an
    * absolute bp gap. One scan, one 9-group aggregate: at 100 TB the
    * audit costs a single map-combinable pass. */
  private val q180 = Q(
    "q180_benford_audit",
    (s, dir) => {
      val expBp = "CASE digit WHEN 1 THEN 3010 WHEN 2 THEN 1761 WHEN 3 THEN 1249" +
        " WHEN 4 THEN 969 WHEN 5 THEN 792 WHEN 6 THEN 669 WHEN 7 THEN 580" +
        " WHEN 8 THEN 512 ELSE 458 END"
      val d = T(s, dir, "orders")
        .select(substring((dec("o_totalprice") * 100).cast(LongType).cast("string"), 1, 1)
          .cast(LongType).as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      d.withColumn("total", sum(col("n")).over(Window.partitionBy()))
        .select(col("digit"), col("n"),
          expr("(10000 * n) div total").as("obs_bp"),
          expr(s"CAST(($expBp) AS BIGINT)").as("exp_bp"))
        .withColumn("dev_bp", abs(col("obs_bp") - col("exp_bp")))
        .orderBy(asc_nulls_first("digit"))
    },
    Some("""WITH d AS (
        SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM orders),
      g AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
      t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM g)
      SELECT digit, n, CAST((10000 * n) // total AS BIGINT) AS obs_bp,
             CAST(CASE digit WHEN 1 THEN 3010 WHEN 2 THEN 1761 WHEN 3 THEN 1249
                  WHEN 4 THEN 969 WHEN 5 THEN 792 WHEN 6 THEN 669 WHEN 7 THEN 580
                  WHEN 8 THEN 512 ELSE 458 END AS BIGINT) AS exp_bp,
             CAST(abs((10000 * n) // total - CASE digit WHEN 1 THEN 3010 WHEN 2 THEN 1761
                  WHEN 3 THEN 1249 WHEN 4 THEN 969 WHEN 5 THEN 792 WHEN 6 THEN 669
                  WHEN 7 THEN 580 WHEN 8 THEN 512 ELSE 458 END) AS BIGINT) AS dev_bp
      FROM g, t
      ORDER BY digit ASC NULLS FIRST"""),
    "Benford first-digit audit: inlined bp constants (no runtime log), integer-div observed rates, one map-combinable 9-group pass")

  /** q181: RFM segmentation — recency / frequency / monetary quintiles
    * per customer, the standard marketing / lifecycle-scoring cut. Each
    * dimension is bucketed 1..5 by RANK (ties broken by customer key, so
    * the bucketing is total and deterministic): bucket = 1 +
    * (5·(rank−1)) div n. Three global sorts over the CUSTOMER aggregate
    * (dimension-sized, not fact-sized — the fact scan reduces first);
    * the oracle derives each rank declaratively (count of customers
    * strictly smaller in the same order) — no window. Output: the
    * customer count and total cents per 3-digit RFM code. */
  private val q181 = Q(
    "q181_rfm",
    (s, dir) => {
      val maxDay = T(s, dir, "orders").agg(max(col("o_orderdate")).as("mx"))
      val cust = T(s, dir, "orders")
        .select(col("o_custkey").as("ck"), col("o_orderdate"),
          (dec("o_totalprice") * 100).cast(LongType).as("cents"))
        .groupBy(col("ck"))
        .agg(max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("freq"), sum(col("cents")).as("money"))
        .crossJoin(broadcast(maxDay))
        .select(col("ck"), datediff(col("mx"), col("last_order")).cast(LongType).as("rec"),
          col("freq"), col("money"))
      val n = Window.partitionBy()
      val ranked = cust
        .withColumn("n_all", count(lit(1)).over(n))
        .withColumn("rk_rec", rank().over(Window.orderBy(asc("rec"), asc("ck"))))
        .withColumn("rk_freq", rank().over(Window.orderBy(desc("freq"), asc("ck"))))
        .withColumn("rk_money", rank().over(Window.orderBy(desc("money"), asc("ck"))))
        .select(col("ck"), col("money"),
          expr("1 + (5 * (rk_rec - 1)) div n_all").as("r"),
          expr("1 + (5 * (rk_freq - 1)) div n_all").as("f"),
          expr("1 + (5 * (rk_money - 1)) div n_all").as("m"))
      ranked.groupBy((col("r") * 100 + col("f") * 10 + col("m")).as("rfm_code"))
        .agg(count(lit(1)).as("n_customers"), sum(col("money")).as("sum_cents"))
        .orderBy(asc_nulls_first("rfm_code"))
    },
    Some("""WITH mx AS (SELECT MAX(o_orderdate) AS mx FROM orders),
      cust AS (SELECT o_custkey AS ck,
                 date_diff('day', MAX(o_orderdate), (SELECT mx FROM mx)) AS rec,
                 COUNT(*) AS freq,
                 CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS money
               FROM orders GROUP BY 1),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM cust),
      rk AS (SELECT a.ck, a.money,
               1 + (5 * CAST((SELECT COUNT(*) FROM cust b
                     WHERE b.rec < a.rec OR (b.rec = a.rec AND b.ck < a.ck)) AS BIGINT))
                   // (SELECT n_all FROM nn) AS r,
               1 + (5 * CAST((SELECT COUNT(*) FROM cust b
                     WHERE b.freq > a.freq OR (b.freq = a.freq AND b.ck < a.ck)) AS BIGINT))
                   // (SELECT n_all FROM nn) AS f,
               1 + (5 * CAST((SELECT COUNT(*) FROM cust b
                     WHERE b.money > a.money OR (b.money = a.money AND b.ck < a.ck)) AS BIGINT))
                   // (SELECT n_all FROM nn) AS m
             FROM cust a)
      SELECT CAST(r * 100 + f * 10 + m AS BIGINT) AS rfm_code,
             COUNT(*) AS n_customers, CAST(SUM(money) AS BIGINT) AS sum_cents
      FROM rk GROUP BY 1
      ORDER BY rfm_code ASC NULLS FIRST"""),
    "RFM quintile segmentation: rank-based total bucketing on the customer aggregate (three dimension-sized sorts); oracle derives ranks declaratively (strict-smaller counts)")

  /** q182: chi-square contingency audit — the categorical-association
    * sibling of q140's TVD drift: are order priority and order status
    * independent? Per cell, the χ² contribution (obs·N − rt·ct)² /
    * (rt·ct·N) quantized ×10⁴ — all exact integer arithmetic: d² is
    * computed in DECIMAL(38,0) (oracle: HUGEINT), exact to 1e38, so the
    * guarantee holds to ~3e9 rows even for fully dependent columns
    * (int64 d² was only empirically safe); the quotient is assembled as
    * 10⁴·(d² div den) + (10⁴·(d² mod den)) div den so no intermediate
    * exceeds the decimal width.
    * Every operand is non-negative, so div/floor agree. One
    * |cells|-sized aggregate plus three windows over the 15-row
    * contingency table — marginals never rescan the fact table. */
  private val q182 = Q(
    "q182_chi_square",
    (s, dir) => {
      val cells = T(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("priority"), col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("obs"))
      val byP = Window.partitionBy(col("priority"))
      val byS = Window.partitionBy(col("status"))
      val all0 = Window.partitionBy()
      cells
        .withColumn("rt", sum(col("obs")).over(byP))
        .withColumn("ct", sum(col("obs")).over(byS))
        .withColumn("n", sum(col("obs")).over(all0))
        // d² in DECIMAL(38,0): the int64 bound (d² ≤ 9.2e18 → N ≤ ~55k
        // rows guaranteed) was only empirically safe; decimal is exact to
        // 1e38 (N ≤ ~3e9 rows even fully dependent). The oracle uses
        // HUGEINT — both are exact integers over the whole range, and
        // Spark's div on decimals returns the BIGINT quotient directly.
        // the d/den products must START in decimal, not overflow int64 and
        // then cast: rt*ct*n wraps past ~2e6 rows if multiplied in BIGINT
        .withColumn("d", expr("cast(obs AS decimal(19,0))*n - cast(rt AS decimal(19,0))*ct"))
        .withColumn("d2", expr("cast(d * d AS decimal(38,0))"))
        .withColumn("den", expr("cast(rt AS decimal(38,0)) * ct * n"))
        .withColumn("chi_e4",
          expr("10000 * (d2 div den) + cast((10000 * cast(d2 % den AS decimal(34,0))) div den AS bigint)"))
        .select(col("priority"), col("status"), col("obs"),
          expr("(1000 * cast(rt AS decimal(38,0)) * ct) div n").as("exp_milli"), col("chi_e4"))
        .orderBy(asc_nulls_first("priority"), asc_nulls_first("status"))
    },
    Some("""WITH cells AS (
        SELECT o_orderpriority AS priority, o_orderstatus AS status, COUNT(*) AS obs
        FROM orders GROUP BY 1, 2),
      m AS (SELECT priority, status, obs,
              SUM(obs) OVER (PARTITION BY priority) AS rt,
              SUM(obs) OVER (PARTITION BY status) AS ct,
              SUM(obs) OVER () AS n
            FROM cells)
      SELECT priority, status, obs,
             CAST((1000 * CAST(rt AS HUGEINT) * ct) // n AS BIGINT) AS exp_milli,
             CAST(10000 * (d2 // den) + (10000 * (d2 % den)) // den AS BIGINT) AS chi_e4
      FROM (SELECT priority, status, obs, rt, ct, n,
              (CAST(obs AS HUGEINT)*n - CAST(rt AS HUGEINT)*ct)
                * (CAST(obs AS HUGEINT)*n - CAST(rt AS HUGEINT)*ct) AS d2,
              CAST(rt AS HUGEINT) * ct * n AS den
            FROM m)
      ORDER BY priority ASC NULLS FIRST, status ASC NULLS FIRST"""),
    "chi-square contingency in exact int64 (quotient+remainder assembly avoids the 10^4·d^2 overflow): marginals via windows over the cell table, fact scanned once")

  /** q183: multi-distinct without Expand — distinct users AND distinct
    * active days per event type. Spark plans multiple COUNT(DISTINCT x)
    * in one aggregate via an Expand node that REPLICATES every input row
    * once per distinct column — a 2× scan amplification at 100 TB. The
    * engine computes each distinct with its own two-level aggregate
    * (partial distinct on (key, value) collapses duplicates map-side)
    * and joins the two |key|-sized results — no Expand (plan-gated). */
  private val q183 = Q(
    "q183_multi_distinct",
    (s, dir) => {
      val e = T(s, dir, "events")
        .select(col("event_type"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"))
      val users = e.select(col("event_type"), col("user_id")).distinct()
        .groupBy(col("event_type")).agg(count(lit(1)).as("n_users"))
      val days = e.select(col("event_type"), col("day")).distinct()
        .groupBy(col("event_type")).agg(count(lit(1)).as("n_days"))
      val totals = e.groupBy(col("event_type")).agg(count(lit(1)).as("n_events"))
      totals.join(users, Seq("event_type")).join(days, Seq("event_type"))
        .orderBy(asc_nulls_first("event_type"))
    },
    Some("""SELECT event_type, COUNT(*) AS n_events,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
             CAST(COUNT(DISTINCT strftime(ts, '%Y-%m-%d')) AS BIGINT) AS n_days
      FROM events GROUP BY 1
      ORDER BY event_type ASC NULLS FIRST"""),
    "multi-distinct via per-column two-level aggregates joined on the key — no Expand row replication (plan-gated); oracle uses the literal COUNT(DISTINCT)s")

  /** q184: time-weighted average (TWAP) — each observation weighted by
    * how long it was current (µs to the next same-user event): the
    * correct mean for irregularly sampled telemetry/prices, where the
    * plain average over-weights bursts. Exact int64 throughout:
    * Σ(cents·dt) stays under 3e17 on this data, and the ×1000
    * quantization — which WOULD overflow — is assembled quotient+
    * remainder (1000·(Σ div W) + (1000·(Σ mod W)) div W, q182's trick);
    * one user-keyed window provides the successor. The oracle pairs
    * each event with its successor via q177's tie-broken ROW_NUMBER
    * rn+1 self-join — same (ts_us, event_id) total order, so tied
    * timestamps cannot split the engines, and linear per user where
    * the earlier correlated form was quadratic under a hot key — and
    * replays the same integer quotient. */
  private val q184 = Q(
    "q184_twap",
    (s, dir) => {
      val e = T(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"),
          (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"))
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(asc("ts_us"), asc("event_id"))
      e.withColumn("dt", lead(col("ts_us"), 1).over(byUser) - col("ts_us"))
        .filter(col("dt").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("dt")).as("sum_dt"),
          sum(col("cents") * col("dt")).as("sum_cdt"))
        .select(col("user_id"), col("n_intervals"),
          expr("1000 * (sum_cdt div sum_dt) + (1000 * (sum_cdt % sum_dt)) div sum_dt")
            .as("twap_millicents"))
        .orderBy(asc_nulls_first("user_id"))
    },
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts) ASC, event_id ASC) AS rn
             FROM events),
      g AS (SELECT a.user_id, COUNT(*) AS n_intervals,
              CAST(SUM(b.ts_us - a.ts_us) AS BIGINT) AS sum_dt,
              CAST(SUM(a.cents * (b.ts_us - a.ts_us)) AS BIGINT) AS sum_cdt
            FROM e a JOIN e b ON b.user_id = a.user_id AND b.rn = a.rn + 1
            GROUP BY 1)
      SELECT user_id, n_intervals,
             CAST(1000 * (sum_cdt // sum_dt) + (1000 * (sum_cdt % sum_dt)) // sum_dt
               AS BIGINT) AS twap_millicents
      FROM g ORDER BY user_id ASC NULLS FIRST"""),
    "time-weighted average over irregular samples: one user-keyed lead() window, exact int64 quotient+remainder quantization; oracle pairs intervals via a row_number rn+1 self-join")

  /** q185: ordered string aggregation — the digest/fingerprint column
    * (sorted part list per order) that feeds diffing, caching keys, and
    * human-readable rollups. Determinism is the whole point: the list
    * sorts NUMERICALLY before joining (sorting the stringified keys
    * would order 10 before 2 — the classic silent bug), so both engines
    * must produce byte-identical strings. collect_list is unordered in a
    * distributed engine — the in-aggregate sort_array is what restores
    * a total order. */
  private val q185 = Q(
    "q185_string_agg_digest",
    (s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("orderkey"))
        .agg(count(lit(1)).as("n_lines"),
          concat_ws(",",
            expr("transform(sort_array(collect_list(l_partkey)), x -> CAST(x AS STRING))"))
            .as("parts_csv"))
        .orderBy(asc_nulls_first("orderkey"))
    },
    Some("""SELECT l_orderkey AS orderkey, COUNT(*) AS n_lines,
             string_agg(CAST(l_partkey AS VARCHAR), ',' ORDER BY l_partkey ASC) AS parts_csv
      FROM lineitem GROUP BY 1
      ORDER BY orderkey ASC NULLS FIRST"""),
    "ordered string_agg digest: numeric in-aggregate sort then stringify (stringify-first would misorder); byte-identical across engines under the hash gate")

  /** q189: equi-DEPTH histogram — the CBO statistic q09/q59's equi-width
    * bins can't give (equal-population buckets expose selectivity where
    * the data actually lives; every serious optimizer stores these).
    * Exact rank bucketing, bucket = (8·pos) div n over the global
    * (value, tiebreak) order — computed over VALUE RUNS, not rows: the
    * output (count, min, max per bucket) is invariant to which EQUAL
    * values land on which side of a boundary, so per-row ranks are never
    * needed. One map-combinable groupBy collapses the fact table to its
    * distinct values (bounded by the value domain, not row count — the
    * only O(rows) pass left is the scan-side partial agg), a within-
    * range-bucket cumulative window over those value runs yields each
    * run's global position span, and each run explodes to the ≤8 depth
    * buckets it overlaps with integer-exact overlap widths
    * (boundary(b) = ⌈b·total/8⌉, so run [s,e) contributes
    * min(e,bnd(b+1)) − max(s,bnd(b)) rows to bucket b). Replaces the
    * r12 shape that shuffled and window-sorted every fact row (60 M at
    * sf10, 34–58 s → 7 s; answers hash-identical — the oracle still
    * replays the straight per-ROW global ROW_NUMBER, proving the
    * value-run formulation agrees). */
  private val q189 = Q(
    "q189_equidepth_histogram",
    (s, dir) => {
      val vals = T(s, dir, "lineitem")
        .select((dec("l_extendedprice") * 100).cast(LongType).as("cents"))
        .groupBy(col("cents")).agg(count(lit(1)).as("cnt"))
        .withColumn("vb", expr("cents div 262144"))
        // value-domain-sized; saves 2 fact re-scans. LAZY (r16): the
        // offsets aggregation below materializes it in its own job.
        .localCheckpoint(false)
      val offsets = vals.groupBy(col("vb")).agg(sum(col("cnt")).as("cnt"))
        .withColumn("off",
          coalesce(sum(col("cnt")).over(
            Window.orderBy(asc("vb")).rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
      // coalesce: sum() is null on an empty fact table (getLong would
      // NPE); total == 0 also guards the `div $total` bucket exprs below
      val total = offsets.agg(coalesce(sum(col("cnt")), lit(0L))).head().getLong(0)
      if (total == 0L)
        vals.select(col("cents").as("b8"), col("cnt").as("n_rows"),
          col("cents").as("min_cents"), col("cents").as("max_cents"))
          .limit(0) // vals is empty when total is: schema-only result
      else {
        val w = Window.partitionBy(col("vb")).orderBy(asc("cents"))
          .rowsBetween(Window.unboundedPreceding, -1)
        vals.join(broadcast(offsets.select(col("vb"), col("off"))), Seq("vb"))
          .withColumn("s", col("off") + coalesce(sum(col("cnt")).over(w), lit(0L)))
          .withColumn("e", col("s") + col("cnt"))
          .select(col("cents"), col("s"), col("e"),
            explode(expr(s"sequence((8 * s) div $total, (8 * (e - 1)) div $total)")).as("b8"))
          .withColumn("n",
            least(col("e"), expr(s"((b8 + 1) * $total + 7) div 8"))
              - greatest(col("s"), expr(s"(b8 * $total + 7) div 8")))
          .groupBy(col("b8"))
          .agg(sum(col("n")).as("n_rows"), min(col("cents")).as("min_cents"),
            max(col("cents")).as("max_cents"))
          .orderBy(asc_nulls_first("b8"))
      }
    },
    Some("""WITH t AS (
        SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
               l_orderkey AS ok, l_linenumber AS ln
        FROM lineitem),
      p AS (SELECT cents,
              ROW_NUMBER() OVER (ORDER BY cents ASC, ok ASC, ln ASC) - 1 AS pos,
              (SELECT COUNT(*) FROM t) AS n
            FROM t)
      SELECT CAST((8 * pos) // n AS BIGINT) AS b8, COUNT(*) AS n_rows,
             MIN(cents) AS min_cents, MAX(cents) AS max_cents
      FROM p GROUP BY 1
      ORDER BY b8 ASC NULLS FIRST"""),
    "equi-depth histogram via exact distributed rank bucketing (q112's two-level pattern — no global sort); oracle replays the straight global row_number")

  /** q231: probabilistic record linkage — the blocked match-and-decide
    * pass an ingest pipeline runs to reconcile dirty records against a
    * master table (Fellegi & Sunter 1969 shape: blocking key → per-pair
    * agreement scores → best-match decision with a threshold). Probe
    * records are customers (c_custkey % 10 = 7) with one character
    * deleted from the name at a key-determined position (the classic
    * typo model); candidates join on the UNDAMAGED blocking fields
    * (nation, segment); the name agreement is the native Jaro-Winkler
    * codegen expression (q125's scorer, byte-identical to DuckDB's),
    * the secondary agreement is exact acctbal equality, and the
    * decision is the (jw desc, bal_match desc, key asc) argmax per
    * probe above jw ≥ 0.9 — one row_number window over the block join.
    *
    * Scale shape (r13): scoring is DEDUPE-FIRST (q89's move) — JW is a
    * pure function of the name pair, so it computes once per distinct
    * (block, probe_name) × (block, cand_name) CELL pair, which the
    * fixture's bounded name vocabulary keeps broadcast-sized while the
    * row-level block join grows quadratically (the r12 shape scored and
    * shuffled every surviving row pair: 15.7 M at sf1, ~1.6 B at sf10,
    * 252 s). Because jw_bp is the FIRST key of the decision order, only
    * cells tied at the per-probe-name maximum can contain the winner —
    * the expansion back to rows touches just those cells, and the final
    * (bal_match desc, cand_key asc) argmax is a partial-aggregating
    * min-of-struct, not a window over the block join. On an
    * all-distinct-names corpus the cell frame degenerates to the row
    * frame and this is exactly the r12 plan — never worse; production
    * raises blocking-key cardinality (the complementary
    * sorted-neighborhood pass is q163). */
  private val q231 = Q(
    "q231_record_linkage",
    (s, dir) => {
      val c = T(s, dir, "customer")
      val probes = c.filter(col("c_custkey") % 10 === 7)
        .select(col("c_custkey").as("probe_key"),
          expr("concat(substring(c_name, 1, 10 + pmod(c_custkey, 7)), substring(c_name, 12 + pmod(c_custkey, 7)))")
            .as("probe_name"),
          col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"),
          col("c_acctbal").as("bal"))
      val cands = c.select(col("c_custkey").as("cand_key"),
        col("c_name").as("cand_name"), col("c_nationkey").as("nk"),
        col("c_mktsegment").as("seg"), col("c_acctbal").as("cbal"))
      // the agreement score is quantized to FLOORED basis points, not
      // round(jw, 4): floor(x * 1e4) over the byte-identical IEEE double
      // is engine-exact, while HALF_UP-vs-float rounding can flip a
      // .00005-boundary score (and with it the threshold and the rank)
      // between Spark and the oracle
      val pCells = probes.select(col("nk"), col("seg"), col("probe_name")).distinct()
      val cCells = cands.select(col("nk"), col("seg"), col("cand_name")).distinct()
      val cellScores = pCells.join(cCells, Seq("nk", "seg"))
        .select(col("nk"), col("seg"), col("probe_name"), col("cand_name"),
          floor(StringSim.jaroWinkler(col("probe_name"), col("cand_name")) * 10000)
            .cast(LongType).as("jw_bp"))
        .filter(col("jw_bp") >= 9000)
      // jw_bp leads the decision order, so the winner lives in a cell
      // tied at the per-(block, probe_name) maximum — expand only those
      val wmax = Window.partitionBy(col("nk"), col("seg"), col("probe_name"))
      val topCells = cellScores
        .withColumn("maxjw", max(col("jw_bp")).over(wmax))
        .filter(col("jw_bp") === col("maxjw")).drop("maxjw")
      // within a probe every expanded row carries the same jw_bp, so the
      // (jw desc, bal_match desc, cand_key asc) argmax reduces to a
      // lexicographic min-of-struct — map-side combinable, no window
      probes.join(topCells, Seq("nk", "seg", "probe_name"))
        .join(cands, Seq("nk", "seg", "cand_name"))
        .select(col("probe_key"),
          struct((lit(1L) - (col("bal") === col("cbal")).cast(LongType)).as("nb"),
            col("cand_key").as("ck"), col("jw_bp").as("j")).as("cand"))
        .groupBy(col("probe_key")).agg(min(col("cand")).as("best"))
        .select(col("probe_key"), col("best.ck").as("matched_key"),
          col("best.j").as("jw_bp"), (lit(1L) - col("best.nb")).as("bal_match"),
          (col("best.ck") === col("probe_key")).cast(LongType).as("correct"))
        .orderBy(asc_nulls_first("probe_key"))
    },
    Some("""WITH probes AS (
        SELECT c_custkey AS probe_key,
               concat(substring(c_name, 1, CAST(10 + c_custkey % 7 AS INTEGER)),
                      substring(c_name, CAST(12 + c_custkey % 7 AS INTEGER))) AS probe_name,
               c_nationkey AS nk, c_mktsegment AS seg, c_acctbal AS bal
        FROM customer WHERE c_custkey % 10 = 7),
      scored AS (
        SELECT p.probe_key, c.c_custkey AS cand_key,
               CAST(floor(jaro_winkler_similarity(p.probe_name, c.c_name) * 10000) AS BIGINT) AS jw_bp,
               CAST(p.bal = c.c_acctbal AS BIGINT) AS bal_match
        FROM probes p JOIN customer c
          ON c.c_nationkey = p.nk AND c.c_mktsegment = p.seg
        WHERE floor(jaro_winkler_similarity(p.probe_name, c.c_name) * 10000) >= 9000),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY probe_key
                 ORDER BY jw_bp DESC, bal_match DESC, cand_key ASC NULLS FIRST) AS rn
        FROM scored)
      SELECT probe_key, cand_key AS matched_key, jw_bp, bal_match,
             CAST(cand_key = probe_key AS BIGINT) AS correct
      FROM ranked WHERE rn = 1
      ORDER BY probe_key ASC NULLS FIRST"""),
    "blocked record linkage: typo-damaged probes vs master, native Jaro-Winkler agreement quantized to floored basis points (engine-exact, no HALF_UP boundary flips) + exact-field tie-break, windowed best-match decision")

  val all: Seq[Q] = Seq(q83, q84, q85, q86, q87, q89, q90, q91, q112, q123, q124,
    q125, q128, q138, q139, q140, q141, q152, q157, q158, q159, q166, q167, q169,
    q171, q172, q175, q176, q177, q178, q180, q181, q182, q183, q184, q185, q189,
    q231)
}
