package graft.llm

import graft.{Q, T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Near-duplicate detection for training-data pipelines (builder-prompt
  * dedup surface): MinHash+LSH, SimHash, n-gram Jaccard, embedding LSH.
  *
  * Scale shape (the part that matters at 100 TB):
  *  - signatures are ONE explode + ONE groupBy(doc_id) with 64 map-side
  *    partial mins — shuffle carries (doc_id, 64×long), never the text;
  *  - candidate generation shuffles on the band/bucket key only;
  *  - exact verification joins texts ONLY for surviving candidate pairs.
  * No all-pairs comparison anywhere.
  */
object Dedup {

  val NumHashes = 64
  val Bands = 16 // × 4 rows per band

  /** Distinct word 3-shingles (whole text when shorter than 3 tokens). */
  private val shingleExpr = expr(
    """case when size(split(text, ' ')) >= 3 then
         array_distinct(transform(sequence(0, size(split(text, ' ')) - 3),
           i -> concat_ws(' ',
             element_at(split(text, ' '), i + 1),
             element_at(split(text, ' '), i + 2),
             element_at(split(text, ' '), i + 3))))
       else array(text) end""")

  /** MinHash signatures: min over shingles of xxhash64(shingle, seed=k)
    * for k in [0, 64). */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val exploded = docs.select(col("doc_id"), explode(shingleExpr).as("shingle"))
    val aggs = (0 until NumHashes).map(k =>
      min(xxhash64(col("shingle"), lit(k))).as(s"mh$k"))
    exploded.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until NumHashes).map(k => col(s"mh$k")): _*).as("sig"))
  }

  /** SimHash: 64-bit sign-of-weighted-bit-sums over token hashes. */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok"), lit(1)))
    val bitSums = (0 until 64).map(j =>
      sum(when(col("h").bitwiseAND(lit(1L << j)) =!= 0, 1).otherwise(-1)).as(s"b$j"))
    val summed = toks.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val assembled = (0 until 64).map(j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    summed.select(col("doc_id"), assembled.as("simhash"))
  }

  /** Winnowing-style fingerprint: min rolling hash over char 8-grams. */
  private val fingerprintExpr = expr(
    """array_min(transform(sequence(1, greatest(length(text) - 7, 1)),
         i -> xxhash64(substring(text, i, 8))))""")

  /** One row per doc with every dedup signature (the row-bearing output;
    * pair queries below may legitimately be empty on a dup-free corpus). */
  private val q24 = Q(
    "q24_dedup_signatures",
    (s, dir) => {
      val docs = T(s, dir, "documents")
      val mh = minhashSignatures(docs)
      val sh = simhash(docs)
      docs.select(col("doc_id"), md5(col("text").cast("binary")).as("exact_hash"),
          fingerprintExpr.as("fingerprint"))
        .join(mh, Seq("doc_id"))
        .join(sh, Seq("doc_id"))
        .select(col("doc_id"), col("exact_hash"), col("fingerprint"),
          col("simhash"), col("sig").as("minhash_sig"))
        .orderBy(asc_nulls_first("doc_id"))
    },
    None,
    "per-doc dedup signatures: md5, winnowing fingerprint, simhash, minhash (dedup surface)")

  /** MinHash LSH: banded signatures → bucket self-join → candidate pairs
    * with estimated (signature-agreement) and exact (shingle-set) Jaccard. */
  def minhashPairs(s: SparkSession, docs: DataFrame): DataFrame = {
    val sigs = minhashSignatures(docs)
    val bandHash = array((0 until Bands).map { b =>
      xxhash64((0 until 4).map(i => element_at(col("sig"), b * 4 + i + 1)) :+ lit(b): _*)
    }: _*)
    val banded = sigs.select(col("doc_id"), col("sig"),
        posexplode(bandHash).as(Seq("band", "bh")))
    val a = banded.alias("a")
    val b = banded.alias("b")
    val cand = a.join(b,
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(first(col("a.sig")).as("sig_a"), first(col("b.sig")).as("sig_b"))
      .withColumn("est_jaccard", round(
        expr("aggregate(zip_with(sig_a, sig_b, (x, y) -> case when x = y then 1.0 else 0.0 end), 0D, (acc, x) -> acc + x)")
          / NumHashes, 4))
    // exact verification: shingle-set Jaccard, texts joined only for candidates
    val sh = docs.select(col("doc_id"), shingleExpr.as("shingles"))
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"),
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType)
          / size(array_union(col("sh_a"), col("sh_b"))), 4).as("jaccard"))
      .orderBy(asc_nulls_first("doc_a"), asc_nulls_first("doc_b"))
  }

  private val q25 = Q(
    "q25_minhash_pairs",
    (s, dir) => minhashPairs(s, T(s, dir, "documents")),
    None,
    "MinHash-LSH candidate pairs + exact n-gram Jaccard verify (dedup surface)")

  /** SimHash near-dup pairs: 4×16-bit chunk bucketing (a pair within
    * Hamming distance 3 must agree on ≥1 chunk) + exact bit_count verify. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = simhash(docs)
    val chunks = sh.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("chunk", "ch")))
    val a = chunks.alias("a")
    val b = chunks.alias("b")
    a.join(b,
        col("a.chunk") === col("b.chunk") && col("a.ch") === col("b.ch") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(asc_nulls_first("doc_a"), asc_nulls_first("doc_b"))
  }

  private val q26 = Q(
    "q26_simhash_pairs",
    (s, dir) => simhashPairs(T(s, dir, "documents")),
    None,
    "SimHash chunk-bucketed near-dup pairs (dedup surface)")

  // ---- embedding near-dup / ANN via random-hyperplane LSH ---------------

  val Dim = 64
  val TablesL = 8
  val BitsPerTable = 12

  /** Deterministic hyperplanes (seeded; generated once on the driver —
    * constants, not data). */
  private lazy val planes: Array[Array[Double]] = {
    val r = new scala.util.Random(20260812L)
    Array.fill(TablesL * BitsPerTable)(Array.fill(Dim)(r.nextGaussian()))
  }

  private def dotPlane(v: Column, p: Array[Double]): Column = {
    val parr = array(p.map(lit): _*)
    expr2(v, parr)
  }
  private def expr2(v: Column, parr: Column): Column =
    aggregate(zip_with(v, parr, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L bucket keys per vector: table t's key packs BitsPerTable sign bits. */
  def lshBuckets(vecs: DataFrame, vecCol: String): DataFrame = {
    val keys = (0 until TablesL).map { t =>
      (0 until BitsPerTable).map { j =>
        when(dotPlane(col(vecCol), planes(t * BitsPerTable + j)) > 0,
          lit(1L << j)).otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseOR(b)).as(s"k$t")
    }
    vecs.select(col("*") +: keys: _*)
      .select(col("*"), posexplode(array((0 until TablesL).map(t => col(s"k$t")): _*))
        .as(Seq("table", "bucket")))
      .drop((0 until TablesL).map(t => s"k$t"): _*)
  }

  private def norm(v: Column): Column = sqrt(expr2(v, v))

  /** Embedding near-dup pairs above a cosine threshold, candidates from
    * multi-table LSH (≈74% recall per table config at cos 0.9), verified
    * exactly. */
  def embeddingNearDups(s: SparkSession, emb: DataFrame, threshold: Double): DataFrame = {
    val vecs = emb.select(col("vec_id"),
      col("embedding").cast(ArrayType(DoubleType)).as("v"))
      .withColumn("nrm", norm(col("v")))
    val bucketed = lshBuckets(vecs, "v")
    val a = bucketed.alias("a")
    val b = bucketed.alias("b")
    a.join(b,
        col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .groupBy(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .agg(first(col("a.v")).as("va"), first(col("b.v")).as("vb"),
        first(col("a.nrm")).as("na"), first(col("b.nrm")).as("nb"))
      .select(col("id_a"), col("id_b"),
        round(expr2(col("va"), col("vb")) / (col("na") * col("nb")), 4).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy(asc_nulls_first("id_a"), asc_nulls_first("id_b"))
  }

  private val q27 = Q(
    "q27_embedding_neardup",
    (s, dir) => embeddingNearDups(s, T(s, dir, "embeddings"), 0.9),
    None,
    "embedding near-dup pairs via multi-table hyperplane LSH + exact cosine (dedup surface)")

  /** Approximate top-k neighbors for the first 5 vectors: LSH candidates
    * only (the scale path; q28_cosine_topk is the exact baseline). */
  def annTopK(s: SparkSession, emb: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vecs = emb.select(col("vec_id"),
      col("embedding").cast(ArrayType(DoubleType)).as("v"))
      .withColumn("nrm", norm(col("v")))
    val bucketed = lshBuckets(vecs, "v")
    val qside = bucketed.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
        col("table"), col("bucket"))
    val cand = bucketed.join(broadcast(qside),
        Seq("table", "bucket"))
      .filter(col("qid") =!= col("vec_id"))
      .groupBy(col("qid"), col("vec_id").as("vid"))
      .agg(first(col("qv")).as("qv"), first(col("qn")).as("qn"),
        first(col("v")).as("cv"), first(col("nrm")).as("cn"))
      .select(col("qid"), col("vid"),
        round(expr2(col("qv"), col("cv")) / (col("qn") * col("cn")), 4).as("score"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(desc_nulls_last("score"), asc_nulls_first("vid"))
    cand.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
      .orderBy(asc_nulls_first("qid"), asc_nulls_first("vid"))
  }

  private val q30 = Q(
    "q30_ann_lsh_topk",
    (s, dir) => annTopK(s, T(s, dir, "embeddings"), 10),
    None,
    "LSH-bucketed approximate top-k (similarity-search scale path; exact twin = q28)")

  val all: Seq[Q] = Seq(q24, q25, q26, q27, q30)
}
