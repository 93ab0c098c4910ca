package graft.llm

import graft.{Q, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path next to LSH (builder-prompt similarity surface).
  *
  * Index build = one k-means-style assignment pass over deterministic
  * seed centroids refined by one Lloyd iteration (both plain DataFrame
  * aggregations). Search probes the `nprobe` nearest centroid lists only.
  * At 100 TB the list assignment is the partition key: vectors cluster
  * into centroid-keyed partitions and a query touches nprobe partitions
  * instead of all of them. */
object Ivf {

  val NumLists = 16
  val NProbe = 4

  private val centroidAssignUdf = udf((v: Seq[Double], cents: Seq[Seq[Double]]) => {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var d = 0.0; var i = 0
      val n = math.min(v.length, cent.length)
      while (i < n) { val t = v(i) - cent(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  })

  private val nearestListsUdf = udf((v: Seq[Double], cents: Seq[Seq[Double]], k: Int) => {
    cents.indices.map { c =>
      val cent = cents(c)
      var d = 0.0; var i = 0
      val n = math.min(v.length, cent.length)
      while (i < n) { val t = v(i) - cent(i); d += t * t; i += 1 }
      (c, d)
    }.sortBy(_._2).take(k).map(_._1).toArray
  })

  private val cosineUdf = udf((a: Seq[Double], b: Seq[Double]) => {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / math.sqrt(na * nb)
  })

  /** Centroids: deterministic seeds (every (N/k)-th vector) refined by one
    * distributed Lloyd iteration (groupBy list → element-wise mean). */
  def centroids(emb: DataFrame): DataFrame = {
    val s = emb.sparkSession
    val n = emb.count()
    val step = math.max(1L, n / NumLists)
    val vecs = emb.select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("v"))
    val seeds = vecs.filter(col("vec_id") % step === 0).limit(NumLists)
      .orderBy("vec_id").select(col("v"))
      .collect().map(_.getSeq[Double](0)) // k small vectors — driver-side by design
    val seedsCol = typedLit(seeds.map(_.toArray))
    val assigned = vecs.withColumn("list_id", centroidAssignUdf(col("v"), seedsCol))
    // one Lloyd iteration: element-wise mean per list via posexplode
    assigned.select(col("list_id"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("list_id"), col("dim")).agg(avg(col("x")).as("m"))
      .groupBy(col("list_id"))
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dims"))
      .select(col("list_id"), expr("transform(dims, d -> d.m)").as("centroid"))
  }

  /** Assign every vector to its nearest (refined) centroid list. */
  def index(emb: DataFrame): DataFrame = {
    val cents = centroids(emb).orderBy("list_id")
      .collect().map(_.getSeq[Double](1)) // NumLists small vectors
    val centsCol = typedLit(cents.map(_.toArray))
    emb.select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("v"))
      .withColumn("list_id", centroidAssignUdf(col("v"), centsCol))
  }

  /** Approximate top-k for the first 5 vectors probing NProbe lists. */
  def topK(s: SparkSession, emb: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val idx = index(emb)
    val cents = centroids(emb).orderBy("list_id")
      .collect().map(_.getSeq[Double](1))
    val centsCol = typedLit(cents.map(_.toArray))
    val qside = idx.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        explode(nearestListsUdf(col("v"), centsCol, lit(NProbe))).as("list_id"))
    val cand = idx.join(broadcast(qside), Seq("list_id"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("vid"),
        round(cosineUdf(col("qv"), col("v")), 4).as("score"))
      .groupBy(col("qid"), col("vid")).agg(first(col("score")).as("score"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(desc_nulls_last("score"), asc_nulls_first("vid"))
    cand.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
      .orderBy(asc_nulls_first("qid"), asc_nulls_first("vid"))
  }

  private val q31 = Q(
    "q31_ann_ivf_topk",
    (s, dir) => topK(s, T(s, dir, "embeddings"), 10),
    None,
    "IVF approximate top-k: seed+Lloyd centroids, nprobe probing (similarity scale path #2)")

  val all: Seq[Q] = Seq(q31)
}
