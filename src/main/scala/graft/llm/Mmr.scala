package graft.llm

import graft.{Q, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998) —
  * the serving-side diversification step after dense retrieval: from an
  * anchor's top-n candidates, greedily select k maximizing
  *
  *   MMR(c) = λ·rel(c) − (1−λ)·max_{s ∈ selected} sim(c, s),
  *
  * so near-duplicate hits (which dense retrieval loves) can't crowd the
  * result list. The retrieval stage is the scale-audited part (q28 exact
  * broadcast top-k; q31 IVF at 100 TB); MMR itself is inherently a
  * sequential greedy over ONE anchor's ≤ n candidates, so it runs as
  * `flatMapGroups` with O(n·k) state per group — the documented
  * last-resort case where per-group imperative logic is the honest shape
  * (n is a constant, so no group can outgrow memory, and anchors are
  * embarrassingly parallel across the one qid-keyed shuffle). */
object Mmr {

  /** Shared greedy core over `n` candidates PRE-SORTED in tie-break
    * order: pick argmax of wRel·rel(i) − wSim·maxSim(i) with strict `>`
    * (so the pre-sort position breaks score ties), then raise each
    * remaining candidate's maxSim by sim(i, picked); maxSim starts at 0,
    * so negative similarities never reward a pick. rel/sim are whatever
    * arithmetic the caller chose — double cosine in [[mmrSelect]],
    * exact scaled-integer in [[mmrSelectExact]] (integer-valued doubles
    * ≪ 2⁵³, where +/−/× are exact). Returns (rank, index, score). */
  private def greedy(n: Int, k: Int, rel: Int => Double,
      sim: (Int, Int) => Double, wRel: Double, wSim: Double)
      : Array[(Int, Int, Double)] = {
    val maxSim = Array.fill(n)(0.0)
    val taken = Array.fill(n)(false)
    val out = Array.newBuilder[(Int, Int, Double)]
    var rank = 1
    while (rank <= math.min(k, n)) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      for (i <- 0 until n if !taken(i)) {
        val score = wRel * rel(i) - wSim * maxSim(i)
        if (score > bestScore) { best = i; bestScore = score }
      }
      taken(best) = true
      out += ((rank, best, bestScore))
      for (i <- 0 until n if !taken(i)) {
        val d = sim(i, best)
        if (d > maxSim(i)) maxSim(i) = d
      }
      rank += 1
    }
    out.result()
  }

  /** Greedy MMR over one candidate set. `cands` = (vid, rel, rawVec);
    * vectors are unit-normalized here. Ties break toward the smaller
    * vid, matching the repo's ranking contract (q28). Returns
    * (rank 1..k, vid, mmrScore). */
  def mmrSelect(cands: Array[(Long, Double, Array[Double])], k: Int,
      lam: Double): Array[(Int, Long, Double)] = {
    val unit = cands.map { case (vid, rel, v) =>
      val n = math.sqrt(v.map(x => x * x).sum)
      (vid, rel, if (n == 0) v else v.map(_ / n))
    }.sortBy { case (vid, rel, _) => (-rel, vid) }
    def dot(i: Int, j: Int): Double =
      unit(i)._3.zip(unit(j)._3).map { case (a, b) => a * b }.sum
    greedy(unit.length, k, unit(_)._2, dot, lam, 1 - lam)
      .map { case (rank, i, score) => (rank, unit(i)._1, score) }
  }

  /** Integer-exact MMR (q204): `cands` = (vid, rel, intVec) with rel and
    * vectors already integer (floor-quantized upstream); λ=0.7 carried as
    * the exact weight pair (7, 3) — score = 7·rel − 3·max(0, maxSim) is
    * integer arithmetic evaluated in doubles far below 2⁵³, so every
    * comparison the greedy makes is exact and an independent engine
    * replaying the same arithmetic picks the identical sequence. Same
    * greedy core and tie-break contract as [[mmrSelect]]. */
  def mmrSelectExact(cands: Array[(Long, Long, Array[Long])], k: Int)
      : Array[(Int, Long, Long)] = {
    val sorted = cands.sortBy { case (vid, rel, _) => (-rel, vid) }
    def dot(i: Int, j: Int): Double = {
      val (a, b) = (sorted(i)._3, sorted(j)._3)
      var s = 0L; var d = 0
      val n = math.min(a.length, b.length) // ragged vectors truncate, as mmrSelect's zip does
      while (d < n) { s += a(d) * b(d); d += 1 }
      s.toDouble
    }
    greedy(sorted.length, k, sorted(_)._2.toDouble, dot, 7.0, 3.0)
      .map { case (rank, i, score) => (rank, sorted(i)._1, score.toLong) }
  }

  /** q160: MMR-diversified top-k serving over the embeddings table —
    * anchors vec_id < 5, top-20 retrieval by exact cosine (q28's
    * broadcast + rounded-rank contract), then λ=0.7 greedy MMR down to 8.
    * Rows-only: greedy selection has no closed-form SQL twin; MmrSpec
    * pins the semantics on planted vectors (a duplicate pair where pure
    * relevance keeps both and MMR provably swaps in the diverse hit). */
  def diversifiedTopK(s: SparkSession, emb: DataFrame, k: Int,
      topn: Int, lam: Double): DataFrame = {
    import graft.geo.GeoExpressions.vecDot
    import s.implicits._
    val e = emb.select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("v"))
    val withN = e.withColumn("nrm", sqrt(vecDot(col("v"), col("v"))))
    val q = withN.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val cc = withN.select(col("vec_id").as("vid"), col("v").as("cv"), col("nrm").as("cn"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(desc_nulls_last("score"), asc_nulls_first("vid"))
    val top = cc.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("vid"))
      .select(col("qid"), col("vid"),
        round(vecDot(col("qv"), col("cv")) / (col("qn") * col("cn")), 4).as("score"),
        col("cv"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topn)
    top.select(col("qid"), col("vid"), col("score"), col("cv"))
      .as[(Long, Long, Double, Seq[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val cands = it.map(t => (t._2, t._3, t._4.toArray)).toArray
        mmrSelect(cands, k, lam).iterator.map { case (rank, vid, sc) =>
          (qid, rank.toLong, vid, math.rint(sc * 10000) / 10000)
        }
      }
      .toDF("qid", "rank", "vid", "mmr_score")
      .orderBy(asc_nulls_first("qid"), asc_nulls_first("rank"))
  }

  private val q160 = Q(
    "q160_mmr_rerank",
    (s, dir) => diversifiedTopK(s, T(s, dir, "embeddings"), 8, 20, 0.7),
    None,
    "MMR-diversified top-k serving: q28 retrieval contract + bounded per-anchor greedy (flatMapGroups, O(topn*k) state); semantics pinned by MmrSpec")

  // ---- MMR under the ORACLE gate (q160's integer-exact twin) ----------

  /** q204: [[diversifiedTopK]]'s exact plan shape — broadcast retrieval,
    * qid-keyed flatMapGroups greedy — in arithmetic BOTH engines evaluate
    * bit-identically, so the greedy SELECTION LOGIC itself sits under the
    * DuckDB hash gate (q160's λ-cosine scores are float-ordering-fragile;
    * this twin is why that one can stay rows-only). Embeddings are
    * floor-quantized to integers (float→double→×1000→floor is the same
    * IEEE op sequence in Spark and DuckDB), rel/sim are raw integer dots
    * (≤ 64·530² ≈ 1.8e7, exact), and λ=0.7 becomes the weight pair (7,3).
    * The oracle replays retrieval declaratively and unrolls the k greedy
    * steps as chained argmax CTEs carrying the chosen list. */
  def diversifiedTopKExact(s: SparkSession, emb: DataFrame, k: Int,
      topn: Int): DataFrame = {
    import graft.geo.GeoExpressions.vecDot
    import s.implicits._
    val iv = emb.select(col("vec_id"),
      expr("transform(embedding, x -> floor(cast(x AS double) * 1000d))")
        .cast(ArrayType(DoubleType)).as("v"))
    val q = iv.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val cc = iv.select(col("vec_id").as("vid"), col("v").as("cv"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(desc_nulls_last("rel"), asc_nulls_first("vid"))
    val top = cc.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("vid"))
      .select(col("qid"), col("vid"),
        vecDot(col("qv"), col("cv")).cast("long").as("rel"), col("cv"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topn)
    top.select(col("qid"), col("vid"), col("rel"), col("cv"))
      .as[(Long, Long, Long, Seq[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val cands = it.map(t => (t._2, t._3, t._4.map(_.toLong).toArray)).toArray
        mmrSelectExact(cands, k).iterator.map { case (rank, vid, sc) =>
          (qid, rank.toLong, vid, sc)
        }
      }
      .toDF("qid", "rank", "vid", "mmr_score")
      .orderBy(asc_nulls_first("qid"), asc_nulls_first("rank"))
  }

  /** The k greedy steps as chained CTEs: m_i scores the remaining
    * candidates against the chosen list (maxSim = GREATEST(0, MAX sim) —
    * the greedy's 0-floored update), s_i is the argmax with the
    * (score DESC, rel DESC, vid ASC) tie-break (= strict-> over the
    * (-rel, vid) pre-sort), c_i appends the pick. All BIGINT. */
  private def mmrOracleSql(k: Int, topn: Int): String = {
    val steps = (2 to k).map { i =>
      s"""m$i AS (
        SELECT t.qid, t.vid, t.rel,
               7 * t.rel - 3 * GREATEST(0, MAX(sm.s)) AS score
        FROM top t
        JOIN c${i - 1} c ON c.qid = t.qid AND NOT list_contains(c.chosen, t.vid)
        JOIN sim sm ON sm.qid = t.qid AND sm.v1 = t.vid
                   AND list_contains(c.chosen, sm.v2)
        GROUP BY t.qid, t.vid, t.rel),
      s$i AS (
        SELECT qid, vid, score FROM (
          SELECT qid, vid, score, row_number() OVER (PARTITION BY qid
            ORDER BY score DESC NULLS LAST, rel DESC NULLS LAST,
                     vid ASC NULLS FIRST) AS rn
          FROM m$i) WHERE rn = 1),
      c$i AS (
        SELECT c.qid, list_append(c.chosen, s.vid) AS chosen
        FROM c${i - 1} c JOIN s$i s USING (qid))"""
    }.mkString(",\n      ")
    val union = (1 to k)
      .map(i => s"SELECT qid, CAST($i AS BIGINT) AS rank, vid, score AS mmr_score FROM s$i")
      .mkString("\n      UNION ALL ")
    s"""WITH iv AS (
        SELECT vec_id,
               list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000)) AS v
        FROM embeddings),
      qs AS (SELECT vec_id AS qid, v AS qv FROM iv WHERE vec_id < 5),
      rel AS (
        SELECT qs.qid, iv.vec_id AS vid,
               CAST(list_dot_product(qs.qv, iv.v) AS BIGINT) AS rel
        FROM iv CROSS JOIN qs WHERE iv.vec_id <> qs.qid),
      top AS (
        SELECT qid, vid, rel FROM (
          SELECT qid, vid, rel, row_number() OVER (PARTITION BY qid
            ORDER BY rel DESC NULLS LAST, vid ASC NULLS FIRST) AS rn
          FROM rel) WHERE rn <= $topn),
      sim AS (
        SELECT t1.qid, t1.vid AS v1, t2.vid AS v2,
               CAST(list_dot_product(a.v, b.v) AS BIGINT) AS s
        FROM top t1 JOIN top t2 ON t1.qid = t2.qid AND t1.vid <> t2.vid
        JOIN iv a ON a.vec_id = t1.vid
        JOIN iv b ON b.vec_id = t2.vid),
      m1 AS (SELECT qid, vid, rel, 7 * rel AS score FROM top),
      s1 AS (
        SELECT qid, vid, score FROM (
          SELECT qid, vid, score, row_number() OVER (PARTITION BY qid
            ORDER BY score DESC NULLS LAST, rel DESC NULLS LAST,
                     vid ASC NULLS FIRST) AS rn
          FROM m1) WHERE rn = 1),
      c1 AS (SELECT qid, [vid] AS chosen FROM s1),
      $steps
      SELECT qid, rank, vid, mmr_score FROM (
        $union)
      ORDER BY qid ASC NULLS FIRST, rank ASC NULLS FIRST"""
  }

  private val q204 = Q(
    "q204_mmr_exact",
    (s, dir) => diversifiedTopKExact(s, T(s, dir, "embeddings"), 8, 20),
    Some(mmrOracleSql(8, 20)),
    "integer-exact MMR twin: q160's broadcast-retrieval + per-anchor greedy with floor-quantized vectors and (7,3) weights, greedy replayed by the oracle as unrolled argmax CTEs")

  // ---- k-center coreset selection (Gonzalez greedy) --------------------

  private val KcK = 8 // coreset size
  private val KcDim = 64 // fixed-slot quantized layout (q205's rule)

  /** q233: k-center coreset selection — the diverse-subset pass a
    * training pipeline runs to pick k maximally-spread exemplars (data
    * selection, active-learning seeding, cluster initialization) —
    * Gonzalez's 2-approximation greedy (TCS 1985): start from the
    * smallest vec_id, then k−1 times add the point FARTHEST from the
    * chosen set (maximin squared L2, smallest-id tie-break). Vectors are
    * floor-quantized so every distance, comparison, and tie-break is
    * exact int64; the oracle unrolls the k−1 argmax steps as chained
    * CTEs (q204's technique).
    *
    * Scale shape: the honest Gonzalez loop is k linear passes — per
    * round ONE broadcast center (64 longs collected driver-side, the
    * codebook precedent), a map-side `least(md, d²)` update, and one
    * max(struct) argmax aggregation; the point set never shuffles, and
    * the running min-distance column replaces any k×n distance
    * materialization. */
  private val q233 = Q(
    "q233_kcenter_coreset",
    (s, dir) => {
      import s.implicits._
      val iv = T(s, dir, "embeddings")
        .select(col("vec_id"),
          expr(s"transform(sequence(1, $KcDim), i -> cast(floor(coalesce(try_element_at(CAST(embedding AS ARRAY<DOUBLE>), i), 0d) * 1000d) AS bigint))")
            .as("q"))
        .localCheckpoint(false)
      def centerVec(id: Long): Seq[Long] =
        iv.filter(col("vec_id") === id).head().getSeq[Long](1)
      def d2To(c: Seq[Long]): org.apache.spark.sql.Column = {
        val lits = c.mkString("array(", "L,", "L)")
        expr(s"aggregate(zip_with(q, $lits, (x, y) -> (x - y) * (x - y)), 0L, (a, w) -> a + w)")
      }
      val c1 = iv.agg(min(col("vec_id"))).head().getLong(0)
      var chosen = Vector((1, c1, 0L))
      var cur = iv.select(col("vec_id"), col("q"), d2To(centerVec(c1)).as("md"))
        .localCheckpoint(true)
      for (step <- 2 to KcK) {
        val ex = chosen.map(_._2)
        val top = cur.filter(!col("vec_id").isInCollection(ex))
          .agg(max(struct(col("md"), (-col("vec_id")).as("nid")))).head().getStruct(0)
        val (md, cid) = (top.getLong(0), -top.getLong(1))
        chosen :+= ((step, cid, md))
        if (step < KcK)
          cur = cur.select(col("vec_id"), col("q"),
              least(col("md"), d2To(centerVec(cid))).as("md"))
            .localCheckpoint(true)
      }
      chosen.toDF("step", "center_id", "maximin_d2")
        .select(col("step").cast("long"), col("center_id"), col("maximin_d2"))
        .orderBy(asc_nulls_first("step"))
    },
    Some {
      val dist = (p: String, c: String) =>
        s"CAST(list_sum([ (x[1] - x[2]) * (x[1] - x[2]) FOR x IN list_zip($p, $c) ]) AS BIGINT)"
      val steps = (2 to KcK).map { i =>
        val mPrev = s"m${i - 1}"
        // the single center row is joined out in a derived table BEFORE
        // touching p: written as `p, iv c, cN WHERE c.vec_id = cN.cid`,
        // DuckDB at sf1 planned the 20k x 20k p x c cross product first
        // and spilled ~80 GB of 64-element lists to temp disk before the
        // cid filter ran
        val upd =
          if (i < KcK)
            s""",
           m$i AS MATERIALIZED (
             SELECT p.vec_id, p.q, LEAST(p.md, ${dist("p.q", "c.q")}) AS md
             FROM $mPrev p, (SELECT iv.q FROM iv, c$i WHERE iv.vec_id = c$i.cid) c)"""
          else ""
        s"""c$i AS (SELECT vec_id AS cid, md FROM $mPrev
             WHERE vec_id NOT IN (SELECT cid FROM chosen${i - 1})
             ORDER BY md DESC, vec_id ASC LIMIT 1),
           chosen$i AS (SELECT cid FROM chosen${i - 1} UNION ALL SELECT cid FROM c$i)$upd"""
      }.mkString(",\n      ")
      val sel = (2 to KcK).map(i =>
        s"SELECT $i AS step, cid AS center_id, md AS maximin_d2 FROM c$i").mkString("\n        UNION ALL ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      iv AS MATERIALIZED (
        SELECT vec_id,
               list_transform(range(1, ${KcDim + 1}),
                 i -> CAST(floor(coalesce(v[CAST(i AS INTEGER)], 0) * 1000) AS BIGINT)) AS q
        FROM e),
      c1 AS (SELECT MIN(vec_id) AS cid FROM iv),
      chosen1 AS (SELECT cid FROM c1),
      m1 AS MATERIALIZED (
        SELECT p.vec_id, p.q, ${dist("p.q", "c.q")} AS md
        FROM iv p, (SELECT iv.q FROM iv, c1 WHERE iv.vec_id = c1.cid) c),
      $steps
      SELECT CAST(step AS BIGINT) AS step, center_id, maximin_d2 FROM (
        SELECT 1 AS step, cid AS center_id, CAST(0 AS BIGINT) AS maximin_d2 FROM c1
        UNION ALL $sel)
      ORDER BY step ASC NULLS FIRST"""
    },
    s"Gonzalez k-center coreset (k=$KcK): greedy maximin exemplar selection in exact int64; k linear passes, oracle unrolls the argmax chain")

  val all: Seq[Q] = Seq(q160, q204, q233)
}
