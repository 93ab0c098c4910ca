package graft.llm

import graft.{Q, T}
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) — the builder-prompt's
  * "novel sketch" slot, next to HLL++ (q67).
  *
  * Why it matters at 100 TB: exact token frequencies need a groupBy over
  * every token occurrence — a corpus-sized shuffle. The sketch is a fixed
  * d×w array of counters that absorbs occurrences MAP-SIDE inside a typed
  * Aggregator; only (d·w) longs per partition ever merge (associative
  * element-wise sum), so frequency estimation costs one narrow
  * tree-reduction regardless of corpus size or cardinality. Guarantees:
  * estimate ≥ true count (one-sided), estimate ≤ true + εN with
  * probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉. */
object Sketches extends Serializable {

  final val Depth = 5     // δ ≈ e⁻⁵ < 1%
  final val Width = 2048  // ε ≈ e/2048 ≈ 0.13%

  /** Plain long array [d × w], row-major — kryo-friendly buffer. */
  type Cms = Array[Long]

  private def rowHash(row: Int, token: String): Int = {
    // one 64-bit avalanche hash per row (seeded), folded to the width
    val h = scala.util.hashing.MurmurHash3.stringHash(token, 0x9e3779b9 + row)
    math.floorMod(h, Width)
  }

  def add(cms: Cms, token: String, n: Long = 1L): Unit = {
    var r = 0
    while (r < Depth) { cms(r * Width + rowHash(r, token)) += n; r += 1 }
  }

  def estimate(cms: Cms, token: String): Long = {
    var min = Long.MaxValue
    var r = 0
    while (r < Depth) {
      val c = cms(r * Width + rowHash(r, token))
      if (c < min) min = c
      r += 1
    }
    min
  }

  /** Typed Aggregator: tokens stream into per-partition sketches map-side;
    * merge is element-wise sum (associative + commutative). */
  val cmsAgg: Aggregator[String, Cms, Cms] =
    new Aggregator[String, Cms, Cms] {
      def zero: Cms = new Array[Long](Depth * Width)
      def reduce(b: Cms, token: String): Cms = { add(b, token); b }
      def merge(a: Cms, b: Cms): Cms = {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
      def finish(b: Cms): Cms = b
      def bufferEncoder: Encoder[Cms] = Encoders.kryo[Cms]
      def outputEncoder: Encoder[Cms] = Encoders.kryo[Cms]
    }

  /** Heavy hitters with exact verification: one sketch pass bounds the
    * candidate set, then ONLY candidates get an exact count (semi-joined
    * groupBy — the corpus-sized shuffle shrinks to candidate occurrences).
    * Returns (token, exact_n, cms_estimate) for tokens whose estimated
    * frequency ≥ threshold. */
  def heavyHitters(s: SparkSession, docs: DataFrame, threshold: Long): DataFrame = {
    import s.implicits._
    // Persisted so the corpus is tokenized ONCE: the sketch pass and the
    // candidate pass both read the cached token frame instead of each
    // re-scanning + re-exploding the corpus (MEMORY_AND_DISK — spills
    // rather than OOMs when the token frame outgrows executor memory).
    val tokens = docs.select(explode(split(col("text"), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cms = tokens.as[String].select(cmsAgg.toColumn).head()
      val bc = s.sparkContext.broadcast(cms)
      // candidate generation: distinct tokens filtered by the broadcast
      // sketch (map-side; the sketch's one-sided error guarantees no true
      // heavy hitter is missed)
      val isCandidate = udf((t: String) => estimate(bc.value, t) >= threshold)
      val estimateUdf = udf((t: String) => estimate(bc.value, t))
      val verified = tokens.filter(isCandidate(col("token")))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("exact_n"))
        .filter(col("exact_n") >= threshold) // drop sketch false positives
        .withColumn("cms_estimate", estimateUdf(col("token")))
        .orderBy(desc_nulls_last("exact_n"), asc_nulls_first("token"))
      // The result is output-sized BY CONSTRUCTION (≤ totalTokens /
      // threshold survivors — tokens above a frequency floor), so it is
      // materialized eagerly while the token cache is live and returned
      // as a local frame; the unpersist in `finally` then leaves no
      // cached corpus-sized RDD behind (same bounded-collect rationale
      // as the q40 scalar report).
      s.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(verified.collect(): _*)),
        verified.schema)
    } finally { tokens.unpersist(); () }
  }

  /** q77: heavy-hitter tokens over the documents corpus (threshold scales
    * with the corpus so the row set stays stable across sf). DIRECT
    * oracle since r14: the production sketch is the mod-p pairwise-
    * independent family ((a·x+b) mod p mod w — the hash family Cormode &
    * Muthukrishnan's own analysis assumes), which DuckDB replays counter
    * for counter, so the estimate column joins the hash gate instead of
    * being declared engine-specific. The switch is perf-neutral (the
    * token key hashes ONCE, then d affine maps — cheaper than d Murmur
    * passes) and strictly stronger analytically: 2-universality is what
    * the εN bound is proved against. */
  private val q77 = Q(
    "q77_heavy_hitters",
    (s, dir) => {
      val docs = T(s, dir, "documents")
      val n = docs.count()
      heavyHittersModP(s, docs, math.max(10L, n / 2))
    },
    Some(cmsOracleSql(2)),
    "count-min-sketch heavy hitters + exact verify of candidates (novel-sketch slot, q67 sibling); mod-p counters hash-gated")

  /** q100: the WHOLE sketch→candidates→exact-verify pipeline under the
    * oracle gate. The CMS estimate is one-sided (never undercounts), so
    * candidate generation can only over-select and the exact-verified,
    * threshold-filtered output is EXACTLY the true heavy-hitter set —
    * which DuckDB computes as a plain frequency filter. A dropped
    * candidate (sketch bug) or inflated exact count (merge bug) breaks
    * the hash; only the estimate column itself (engine-specific by
    * design, spec-checked) stays outside the gate. */
  private val q100 = Q(
    "q100_heavy_hitters_oracle",
    (s, dir) => {
      val docs = T(s, dir, "documents")
      val n = docs.count()
      heavyHitters(s, docs, math.max(10L, n / 2)).drop("cms_estimate")
    },
    Some("""WITH tok AS (
        SELECT unnest(string_split_regex(text, '\s+')) AS token FROM documents)
      SELECT token, COUNT(*) AS exact_n FROM tok WHERE length(token) > 0
      GROUP BY token
      HAVING COUNT(*) >= greatest(10, (SELECT COUNT(*) // 2 FROM documents))
      ORDER BY exact_n DESC NULLS LAST, token ASC NULLS FIRST"""),
    "count-min sketch + exact verify equals the true heavy-hitter set (one-sided-error guarantee under the hash gate)")

  // ---- CMS counter arithmetic under the ORACLE gate (q216) --------------

  /** q100 gates the heavy-hitter SET (the one-sided-error guarantee); the
    * sketch's counter/estimate arithmetic itself stayed rows-only because
    * Murmur row hashes aren't SQL-expressible. q216 closes that: the same
    * d×w counter array and min-over-rows estimate (Cormode &
    * Muthukrishnan 2005) over SQL-replayable hashes — token key x =
    * Horner base 257 mod 1000003 over the whole token (DuckDB:
    * list_reduce over ascii codes, seeded by the first char exactly like
    * the Scala fold from 0), row buckets h_r(x) = ((a_r·x + b_r) mod p)
    * mod w with LCG-derived a_r, b_r (max intermediate a_r·x < 10¹² —
    * pure int64 on both engines). DuckDB rebuilds the counters as a
    * GROUP BY (r, bucket) COUNT over all token occurrences and replays
    * each candidate's estimate as the min over its d buckets — a wrong
    * bucket index, a lost map-side partial, or a broken merge shifts a
    * counter and breaks the hash. The threshold is n/50 (vs q77/q100's
    * n/2) so the gate keeps a non-empty candidate set on the word-salted
    * sf1 stress fixture, where per-token counts stay at sf0.1 levels
    * while n grows 10× — an empty set would replay the counters but
    * compare nothing. */
  final val PMod = 1000003L
  final val WidthP = 1024

  def modPTokenHash(t: String): Long = {
    var h = 0L
    var i = 0
    while (i < t.length) { h = (h * 257 + t.charAt(i).toInt) % PMod; i += 1 }
    h
  }

  private def aR(r: Int): Long = (2654435761L * (r + 1)) % PMod
  private def bR(r: Int): Long = (40503L * (r + 7)) % PMod

  def modPBucket(r: Int, x: Long): Int = (((aR(r) * x + bR(r)) % PMod) % WidthP).toInt

  /** Same typed-Aggregator shape as [[cmsAgg]] (map-side partial arrays,
    * element-wise merge) with the mod-p hash family. */
  val cmsModPAgg: Aggregator[String, Cms, Cms] =
    new Aggregator[String, Cms, Cms] {
      def zero: Cms = new Array[Long](Depth * WidthP)
      def reduce(b: Cms, token: String): Cms = {
        val x = modPTokenHash(token)
        var r = 0
        while (r < Depth) { b(r * WidthP + modPBucket(r, x)) += 1; r += 1 }
        b
      }
      def merge(a: Cms, b: Cms): Cms = {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
      def finish(b: Cms): Cms = b
      def bufferEncoder: Encoder[Cms] = Encoders.kryo[Cms]
      def outputEncoder: Encoder[Cms] = Encoders.kryo[Cms]
    }

  /** [[heavyHitters]] with the mod-p sketch, estimates kept in the output
    * (the column q77 must declare engine-specific, here hash-gated). */
  def heavyHittersModP(s: SparkSession, docs: DataFrame, threshold: Long): DataFrame = {
    import s.implicits._
    val tokens = docs.select(explode(split(col("text"), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cms = tokens.as[String].select(cmsModPAgg.toColumn).head()
      val bc = s.sparkContext.broadcast(cms)
      def est(t: String): Long = {
        val x = modPTokenHash(t)
        var min = Long.MaxValue
        var r = 0
        while (r < Depth) {
          val c = bc.value(r * WidthP + modPBucket(r, x))
          if (c < min) min = c
          r += 1
        }
        min
      }
      val isCandidate = udf((t: String) => est(t) >= threshold)
      val estimateUdf = udf((t: String) => est(t))
      val verified = tokens.filter(isCandidate(col("token")))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("exact_n"))
        .filter(col("exact_n") >= threshold)
        .withColumn("cms_estimate", estimateUdf(col("token")))
        .orderBy(desc_nulls_last("exact_n"), asc_nulls_first("token"))
      s.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(verified.collect(): _*)),
        verified.schema)
    } finally { tokens.unpersist(); () }
  }

  /** DuckDB token-key hash: fold ascii codes through the Horner step; a
    * single-char token short-circuits to its code on both engines (Scala
    * fold from 0 vs list_reduce's first-element seed agree because
    * 0·257 + c = c). */
  private def tokenHashSql: String =
    """list_reduce(list_transform(range(1, length(token) + 1),
         i -> CAST(ascii(substr(token, CAST(i AS INTEGER), 1)) AS BIGINT)),
       (a, c) -> (a * 257 + c) % 1000003)"""

  /** The CMS replay SQL shared by q216 (threshold n/`div` = n/50, dense
    * candidates on salted fixtures) and q77 (the production n/2). */
  private def cmsOracleSql(div: Int): String = s"""WITH tok AS (
        SELECT token FROM (
          SELECT unnest(string_split_regex(text, '\\s+')) AS token FROM documents)
        WHERE length(token) > 0),
      tx AS (SELECT token, $tokenHashSql AS x FROM tok),
      rs AS (SELECT unnest(range(0, $Depth)) AS r),
      ctr AS (
        SELECT rs.r AS r,
               ((((2654435761 * (rs.r + 1)) % $PMod) * x
                  + ((40503 * (rs.r + 7)) % $PMod)) % $PMod) % $WidthP AS bucket,
               COUNT(*) AS c
        FROM tx CROSS JOIN rs
        GROUP BY 1, 2),
      cand AS (
        SELECT token, any_value(x) AS x, COUNT(*) AS exact_n
        FROM tx GROUP BY token
        HAVING COUNT(*) >= greatest(10, (SELECT COUNT(*) // $div FROM documents))),
      est AS (
        SELECT cand.token, cand.exact_n, MIN(ctr.c) AS cms_estimate
        FROM cand JOIN ctr
          ON ctr.bucket = ((((2654435761 * (ctr.r + 1)) % $PMod) * cand.x
                             + ((40503 * (ctr.r + 7)) % $PMod)) % $PMod) % $WidthP
        GROUP BY cand.token, cand.exact_n)
      SELECT token, exact_n, cms_estimate FROM est
      ORDER BY exact_n DESC NULLS LAST, token ASC NULLS FIRST"""

  private val q216 = Q(
    "q216_cms_estimate_oracle",
    (s, dir) => {
      val docs = T(s, dir, "documents")
      val n = docs.count()
      heavyHittersModP(s, docs, math.max(10L, n / 50))
    },
    Some(cmsOracleSql(50)),
    "count-min counter/estimate arithmetic under the DuckDB hash gate: mod-p row hashes, GROUP-BY counter replay, min-over-rows estimates")

  // ---- HLL register arithmetic under the ORACLE gate (q217) -------------

  /** q162 declares its HLL++ ESTIMATES engine-specific (DataSketches
    * internals); q217 puts the REGISTER arithmetic — the part of
    * HyperLogLog (Flajolet et al. 2007) that carries all the information
    * — under the DuckDB hash gate with a SQL-replayable hash. Per event:
    * h = (|user_id|·2654435761 + 12345) mod (2³¹−1) (|·| keeps h
    * non-negative so `div`/`//` agree across engines), register = h mod
    * 256, suffix w = h div 256 (< 2²³), rank ρ = trailing-zeros(w)+1 via
    * the branch-free identity tz(w) = bit_count((w AND −w) − 1), capped
    * at 24 for w = 0 — bit_count, AND, and unary minus are int64-exact
    * in Spark AND DuckDB. The query maintains the register table twice:
    * through the daily-sketch rollup (groupBy day then max-merge, the
    * q162 incremental pattern) and directly — and reads both out as the
    * INTEGER harmonic-sum numerator S = Σ 2²⁴⁻ρ (absent registers
    * contribute 2²⁴), so the lossless-merge law AND the readout
    * arithmetic are hash-gated without a float anywhere. The float HLL
    * estimate is α·m²/S — a strictly monotone bijection of S given m, so
    * gating (n_registers, S) gates the estimate itself. */
  def hllRegistersExact(events: DataFrame): DataFrame = {
    val rr = events.select(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        ((abs(col("user_id")) * lit(2654435761L) + lit(12345L)) % lit(2147483647L)).as("h"))
      .select(col("event_type"), col("day"),
        (col("h") % 256).as("register"), expr("h div 256").as("w"))
      .select(col("event_type"), col("day"), col("register"),
        when(col("w") === 0, lit(24L))
          .otherwise(expr("cast(bit_count((w & -w) - 1) + 1 as bigint)")).as("rho"))
    def readout(regs: DataFrame, nName: String, sName: String): DataFrame =
      regs.groupBy(col("event_type"))
        .agg(count(lit(1)).as("np"),
          sum(expr("shiftleft(cast(1 as bigint), cast(24 - r as int))")).as("ps"))
        .select(col("event_type"), col("np").as(nName),
          (col("ps") + (lit(256L) - col("np")) * lit(16777216L)).as(sName))
    val daily = rr.groupBy(col("event_type"), col("day"), col("register"))
      .agg(max(col("rho")).as("r"))
    val merged = readout(
      daily.groupBy(col("event_type"), col("register")).agg(max(col("r")).as("r")),
      "n_regs_merged", "s_merged")
    val direct = readout(
      rr.groupBy(col("event_type"), col("register")).agg(max(col("rho")).as("r")),
      "n_regs_direct", "s_direct")
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    merged.join(direct, Seq("event_type")).join(exact, Seq("event_type"))
      .select(col("event_type"), col("n_regs_merged"), col("s_merged"),
        col("n_regs_direct"), col("s_direct"), col("exact_users"))
      .orderBy(asc_nulls_first("event_type"))
  }

  private val q217 = Q(
    "q217_hll_register_oracle",
    (s, dir) => hllRegistersExact(T(s, dir, "events")),
    Some("""WITH rr AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               h % 256 AS register,
               CASE WHEN h // 256 = 0 THEN 24
                    ELSE bit_count(((h // 256) & -(h // 256)) - 1) + 1 END AS rho
        FROM (SELECT event_type, ts,
                (abs(user_id) * 2654435761 + 12345) % 2147483647 AS h
              FROM events)),
      daily AS (SELECT event_type, day, register, MAX(rho) AS r
                FROM rr GROUP BY 1, 2, 3),
      mreg AS (SELECT event_type, register, MAX(r) AS r
               FROM daily GROUP BY 1, 2),
      mo AS (SELECT event_type, COUNT(*) AS n_regs_merged,
               CAST(SUM(CAST(1 AS BIGINT) << CAST(24 - r AS INTEGER))
                 + (256 - COUNT(*)) * 16777216 AS BIGINT) AS s_merged
             FROM mreg GROUP BY 1),
      dreg AS (SELECT event_type, register, MAX(rho) AS r
               FROM rr GROUP BY 1, 2),
      dd AS (SELECT event_type, COUNT(*) AS n_regs_direct,
               CAST(SUM(CAST(1 AS BIGINT) << CAST(24 - r AS INTEGER))
                 + (256 - COUNT(*)) * 16777216 AS BIGINT) AS s_direct
             FROM dreg GROUP BY 1),
      ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
             FROM events GROUP BY 1)
      SELECT event_type, n_regs_merged, s_merged, n_regs_direct, s_direct,
             exact_users
      FROM mo JOIN dd USING (event_type) JOIN ex USING (event_type)
      ORDER BY event_type ASC NULLS FIRST"""),
    "HLL register maintenance, daily-rollup merge law, and integer harmonic-sum readout under the DuckDB hash gate")

  /** Daily per-event-type HLL sketches over events — the PRE-AGGREGATED
    * distinct-counting table a warehouse maintains incrementally (one
    * sketch row per (day, type) partition; new days append, nothing is
    * recomputed), here built in one pass. */
  def dailyUserSketches(s: org.apache.spark.sql.SparkSession,
      events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    events.groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"),
        count(lit(1)).as("n_events"))

  /** q162: mergeable distinct-count sketches (Apache DataSketches HLL,
    * Spark's native hll_* functions) — the pattern that makes COUNT
    * DISTINCT incremental at 100 TB: per-partition sketches are built
    * once (algebraic, map-side combinable), any rollup is a SKETCH UNION
    * (never a rescan), and an estimate is read out at the end. Here:
    * daily (type, day) sketches → per-type month rollup via
    * hll_union_agg, alongside the exact distinct and the single-pass
    * estimate. Rows-only by design — sketch estimates are
    * engine-specific (q67/q77's declared rule) — while SketchesSpec pins
    * the LOSSLESSNESS law at small n: union-of-partials == direct-sketch
    * estimate (same binary sketch state), and the estimate sits within
    * HLL's published error at lgK=12. At dense-regime cardinalities the
    * two estimates legitimately diverge ~1% on IDENTICAL registers: a
    * streamed sketch reads out via the order-dependent HIP estimator, a
    * union via the composite estimator (the DataSketches HLL design;
    * first measured by the r16 skew law row) — so the scale gates assert
    * merged within 2% of direct plus both within 5% of exact. The
    * exact_users column rides along so the output itself exposes the
    * estimate error. */
  private val q162 = Q(
    "q162_hll_sketch_rollup",
    (s, dir) => {
      val ev = T(s, dir, "events")
      val merged = dailyUserSketches(s, ev)
        .groupBy(col("event_type"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("merged_estimate"),
          sum(col("n_events")).as("n_events"),
          count(lit(1)).as("n_days"))
      val direct = ev.groupBy(col("event_type"))
        .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("direct_estimate"),
          countDistinct(col("user_id")).as("exact_users"))
      merged.join(direct, Seq("event_type"))
        .select(col("event_type"), col("n_days"), col("n_events"),
          col("merged_estimate"), col("direct_estimate"), col("exact_users"))
        .orderBy(asc_nulls_first("event_type"))
    },
    None,
    "incremental distinct counting: daily HLL sketch table rolled up by sketch union; merged == direct at small n (spec-pinned), HIP-vs-composite ~1% divergence at dense n (law-gated), exact alongside")

  // ---- KMV / theta sketch: distinct-count SET OPERATIONS (q225) ---------

  /** HLL (q67/q162/q217) answers |A| and |A∪B| (register max-merge) but
    * fundamentally cannot estimate |A∩B| or |A∖B| — registers carry no
    * membership. The K-minimum-values / theta sketch (Bar-Yossef et al.
    * 2002; Dasgupta et al., "Theta Sketch Framework", 2016 — the Apache
    * DataSketches theta design) does: keep the K smallest distinct hash
    * values per set; θ = the K-th smallest (p when |S| < K); for any two
    * sketches degrade to θ = min(θ_A, θ_B) and count retained values
    * below θ — |{V_A ∪ V_B < θ}|, |{V_A ∩ V_B < θ}|, |{V_A ∖ V_B < θ}| —
    * each scaled by p/θ is an unbiased estimate of the corresponding set
    * size. The audience-overlap workhorse (Druid/Presto/BigQuery all ship
    * it) and a per-source corpus-overlap estimator for training-data
    * curation (q149's exact overlap, sketch-sized).
    *
    * Everything here is integer-exact and SQL-replayable, so the WHOLE
    * operator — hash, bounded sketch maintenance, merge, θ degrade,
    * retained-value set ops, p/θ scaling — sits under the DuckDB hash
    * gate directly (no separate mod-p twin needed): h(u) = (2654435761·u
    * + 98765) mod (2³¹−1) is injective for 0 ≤ u < p (coefficient ≢ 0 mod
    * p), products stay < 2⁶³ for u < 2³¹ (guarded loudly, the q205
    * pattern), and estimates use floor division — `div` / `//` agree for
    * non-negative operands.
    *
    * Scale shape: membership (one map-side-combinable groupBy), then a
    * typed Aggregator whose state is ≤ K longs per set — partials absorb
    * map-side, merge is a two-pointer K-cap — so the shuffle carries
    * n_sets × K longs regardless of corpus size. The pair table is built
    * from COLLECTED sketches: n_types² × K longs, sketch-sized by
    * construction (collecting sketches to the coordinator is the point
    * of a sketch — same bounded-collect rationale as q77/q40). Exact
    * counts ride along (q162's pattern) to expose the estimation error;
    * a deployment drops them. */
  final val KmvK = 64
  final val KmvP = 2147483647L // 2^31 − 1, prime

  /** Sorted-distinct insert, capped at [[KmvK]] smallest. */
  def kmvInsert(buf: Array[Long], h: Long): Array[Long] = {
    val i = java.util.Arrays.binarySearch(buf, h)
    if (i >= 0) buf // already present
    else {
      val at = -i - 1
      if (buf.length < KmvK) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, at)
        out(at) = h
        System.arraycopy(buf, at, out, at + 1, buf.length - at)
        out
      } else if (at >= KmvK) buf // h ≥ current K-th smallest
      else {
        val out = new Array[Long](KmvK)
        System.arraycopy(buf, 0, out, 0, at)
        out(at) = h
        System.arraycopy(buf, at, out, at + 1, KmvK - at - 1)
        out
      }
    }
  }

  /** Two-pointer distinct merge of sorted arrays, keep K smallest. */
  def kmvMerge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(KmvK, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val take =
        if (i >= a.length) { val v = b(j); j += 1; v }
        else if (j >= b.length) { val v = a(i); i += 1; v }
        else if (a(i) < b(j)) { val v = a(i); i += 1; v }
        else if (b(j) < a(i)) { val v = b(j); j += 1; v }
        else { val v = a(i); i += 1; j += 1; v }
      if (n == 0 || out(n - 1) != take) { out(n) = take; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** θ and retained-value view of a raw K-cap array: full (|S| < K) ⇒
    * θ = p, all values retained; capped ⇒ θ = K-th smallest, K−1 values
    * below it retained. One formula then serves both branches:
    * estimate = n_retained · p div θ (θ = p ⇒ exact count). */
  def kmvTheta(buf: Array[Long]): Long =
    if (buf.length < KmvK) KmvP else buf(KmvK - 1)

  val kmvAgg: Aggregator[Long, Array[Long], Array[Long]] =
    new Aggregator[Long, Array[Long], Array[Long]] {
      def zero: Array[Long] = Array.emptyLongArray
      def reduce(b: Array[Long], h: Long): Array[Long] = kmvInsert(b, h)
      def merge(a: Array[Long], b: Array[Long]): Array[Long] = kmvMerge(a, b)
      def finish(b: Array[Long]): Array[Long] = b
      def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
      def outputEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    }

  /** [[kmvAgg]] with row-native (array<bigint>) encoders instead of kryo
    * blobs, so the sketch can live inside a STREAMING aggregation's state
    * store and read back from a memory sink as a plain Seq[Long]
    * (q226's daily sketch rows). Same kernel, same laws. */
  val kmvAggRows: Aggregator[Long, Array[Long], Array[Long]] =
    new Aggregator[Long, Array[Long], Array[Long]] {
      def zero: Array[Long] = Array.emptyLongArray
      def reduce(b: Array[Long], h: Long): Array[Long] = kmvInsert(b, h)
      def merge(a: Array[Long], b: Array[Long]): Array[Long] = kmvMerge(a, b)
      def finish(b: Array[Long]): Array[Long] = b
      def bufferEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
      def outputEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    }

  /** q225: per-event-type ACTIVE-user sets (odd per-(type,user) event
    * count — a deterministic membership predicate chosen to produce
    * non-degenerate partial overlaps on the fixture; the sketch is
    * agnostic to what defines the set), theta sketches per set, and for
    * every type pair the degraded-θ retained counts, the p/θ-scaled
    * distinct estimates for ∩ / ∪ / ∖, and the exact values alongside.
    * DuckDB replays the identical sketch: rank distinct hashes per set,
    * keep K smallest, same θ / retained-set / floor-division arithmetic. */
  private val q225 = Q(
    "q225_kmv_theta_setops",
    (s, dir) => {
      import s.implicits._
      val memb = T(s, dir, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("c"))
        .filter(col("c") % 2 === 1)
        // |u| < 2³¹ keeps 2654435761·u < 2⁶³ on both engines; fail loudly
        // (q205's guard pattern) instead of diverging silently
        .filter(assert_true(abs(col("user_id")) < lit(2147483648L),
          lit("user_id magnitude >= 2^31: kmv hash product would overflow int64")).isNull)
        .select(col("event_type"), col("user_id"),
          ((lit(2654435761L) * abs(col("user_id")) + lit(98765L)) % lit(KmvP)).as("h"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val sketches = memb.select(col("event_type"), col("h"))
          .as[(String, Long)]
          .groupByKey(_._1).mapValues(_._2)
          .agg(kmvAgg.toColumn.name("sk"))
          .collect().toMap
        val types = sketches.keys.toSeq.sorted
        val pairRows = for {
          ai <- types.indices; bi <- (ai + 1) until types.length
        } yield {
          val (ta, tb) = (types(ai), types(bi))
          val (va, vb) = (sketches(ta), sketches(tb))
          val theta = math.min(kmvTheta(va), kmvTheta(vb))
          val ra = va.filter(_ < theta).toSet
          val rb = vb.filter(_ < theta).toSet
          val nInter = (ra & rb).size.toLong
          val nUnion = (ra | rb).size.toLong
          val nDiff = (ra -- rb).size.toLong
          (ta, tb, theta, nInter, nUnion, nDiff,
            nInter * KmvP / theta, nUnion * KmvP / theta, nDiff * KmvP / theta)
        }
        val pairDf = pairRows.toDF("ta", "tb", "theta",
          "n_inter", "n_union", "n_diff_ab",
          "est_inter", "est_union", "est_diff_ab")
        val sizes = memb.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"))
        val inter = memb.select(col("event_type").as("ta"), col("user_id"))
          .join(memb.select(col("event_type").as("tb"), col("user_id")), Seq("user_id"))
          .filter(col("ta") < col("tb"))
          .groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("xi"))
        pairDf
          .join(broadcast(inter), Seq("ta", "tb"), "left")
          .join(broadcast(sizes.select(col("event_type").as("ta"), col("n").as("na"))), Seq("ta"))
          .join(broadcast(sizes.select(col("event_type").as("tb"), col("n").as("nb"))), Seq("tb"))
          .select(col("ta"), col("tb"), col("theta"),
            col("n_inter"), col("n_union"), col("n_diff_ab"),
            col("est_inter"), col("est_union"), col("est_diff_ab"),
            coalesce(col("xi"), lit(0L)).as("exact_inter"),
            (col("na") + col("nb") - coalesce(col("xi"), lit(0L))).as("exact_union"),
            (col("na") - coalesce(col("xi"), lit(0L))).as("exact_diff_ab"))
          .orderBy(asc_nulls_first("ta"), asc_nulls_first("tb"))
      } finally { memb.unpersist(); () }
    },
    Some(s"""WITH m AS (
        SELECT event_type AS t, user_id AS u FROM events
        GROUP BY 1, 2 HAVING COUNT(*) % 2 = 1),
      hx AS (SELECT t, u, (2654435761 * abs(u) + 98765) % $KmvP AS h FROM m),
      r AS (SELECT t, h, row_number() OVER (PARTITION BY t ORDER BY h) AS rn,
                   COUNT(*) OVER (PARTITION BY t) AS cnt
            FROM hx),
      th AS (SELECT t, CASE WHEN max(cnt) >= $KmvK
                            THEN max(CASE WHEN rn = $KmvK THEN h END)
                            ELSE $KmvP END AS theta
             FROM r WHERE rn <= $KmvK GROUP BY t),
      v AS (SELECT r.t, r.h FROM r JOIN th USING (t)
            WHERE r.rn <= $KmvK AND r.h < th.theta),
      pairs AS (SELECT a.t AS ta, b.t AS tb, least(a.theta, b.theta) AS theta
                FROM th a JOIN th b ON a.t < b.t),
      pv AS (SELECT p.ta, p.tb, p.theta, v.h,
                    max(CASE WHEN v.t = p.ta THEN 1 ELSE 0 END) AS in_a,
                    max(CASE WHEN v.t = p.tb THEN 1 ELSE 0 END) AS in_b
             FROM pairs p JOIN v ON v.t IN (p.ta, p.tb) AND v.h < p.theta
             GROUP BY 1, 2, 3, 4),
      ag AS (SELECT ta, tb, theta,
                    CAST(SUM(in_a * in_b) AS BIGINT) AS n_inter,
                    CAST(COUNT(*) AS BIGINT) AS n_union,
                    CAST(SUM(in_a * (1 - in_b)) AS BIGINT) AS n_diff_ab
             FROM pv GROUP BY 1, 2, 3),
      sizes AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n FROM m GROUP BY t),
      ex AS (SELECT a.t AS ta, b.t AS tb, CAST(COUNT(*) AS BIGINT) AS xi
             FROM m a JOIN m b ON a.u = b.u AND a.t < b.t
             GROUP BY 1, 2)
      SELECT p.ta, p.tb, p.theta,
             COALESCE(ag.n_inter, 0) AS n_inter,
             COALESCE(ag.n_union, 0) AS n_union,
             COALESCE(ag.n_diff_ab, 0) AS n_diff_ab,
             COALESCE(ag.n_inter, 0) * $KmvP // p.theta AS est_inter,
             COALESCE(ag.n_union, 0) * $KmvP // p.theta AS est_union,
             COALESCE(ag.n_diff_ab, 0) * $KmvP // p.theta AS est_diff_ab,
             COALESCE(ex.xi, 0) AS exact_inter,
             sa.n + sb.n - COALESCE(ex.xi, 0) AS exact_union,
             sa.n - COALESCE(ex.xi, 0) AS exact_diff_ab
      FROM pairs p
      LEFT JOIN ag ON ag.ta = p.ta AND ag.tb = p.tb
      LEFT JOIN ex ON ex.ta = p.ta AND ex.tb = p.tb
      JOIN sizes sa ON sa.t = p.ta
      JOIN sizes sb ON sb.t = p.tb
      ORDER BY p.ta ASC NULLS FIRST, p.tb ASC NULLS FIRST"""),
    "KMV/theta sketch distinct set operations (intersection/union/difference estimates HLL cannot do), fully integer-exact under the DuckDB hash gate")

  val all: Seq[Q] = Seq(q77, q100, q162, q216, q217, q225)
}
