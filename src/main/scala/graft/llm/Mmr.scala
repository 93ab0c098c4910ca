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
    val maxSim = Array.fill(unit.length)(0.0)
    val taken = Array.fill(unit.length)(false)
    val out = Array.newBuilder[(Int, Long, Double)]
    var rank = 1
    while (rank <= math.min(k, unit.length)) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      for (i <- unit.indices if !taken(i)) {
        val score = lam * unit(i)._2 - (1 - lam) * maxSim(i)
        // strict > plus the (-rel, vid) pre-sort = smallest-vid tie-break
        if (score > bestScore) { best = i; bestScore = score }
      }
      taken(best) = true
      out += ((rank, unit(best)._1, bestScore))
      for (i <- unit.indices if !taken(i)) {
        val d = unit(i)._3.zip(unit(best)._3).map { case (a, b) => a * b }.sum
        if (d > maxSim(i)) maxSim(i) = d
      }
      rank += 1
    }
    out.result()
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

  val all: Seq[Q] = Seq(q160)
}
