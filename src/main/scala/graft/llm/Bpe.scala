package graft.llm

import graft.{Q, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding (Sennrich et al. 2016) — trainer and
  * encoder for the training-data-pipeline tokenization surface (the
  * builder prompt's "BPE-ish" token counting, taken to a real learned
  * vocabulary).
  *
  * Scale shape:
  *  - training operates on the DISTINCT-WORD frequency table, not the
  *    corpus: one corpus-wide shuffle builds (word, freq), after which
  *    every merge iteration is a narrow aggregation over the vocabulary
  *    (bounded — millions of rows at web scale, not billions), cached and
  *    re-mapped in place;
  *  - the pair-count per iteration is a flatMap → groupBy → max over that
  *    vocabulary frame; the argmax row (ONE row) is collected per
  *    iteration — the standard driver-coordinated Lloyd-style loop;
  *  - encoding broadcasts the learned merge list and applies it in a
  *    single map pass (no shuffle).
  *
  * Production BPE trainers sample the corpus for exactly this reason; the
  * query trains on a deterministic sample and encodes everything. */
object Bpe {

  /** End-of-word marker (keeps merges from crossing word boundaries). */
  private val Eow = "</w>"

  private def toSymbols(word: String): Seq[String] =
    word.map(_.toString) :+ Eow

  /** Train `numMerges` merges from a (word, freq) table; returns the
    * ordered merge list. Deterministic: ties on pair count break
    * lexicographically. */
  def train(s: SparkSession, wordFreq: DataFrame, numMerges: Int): Seq[(String, String)] = {
    import s.implicits._
    var words = wordFreq.select(col("word"), col("freq"))
      .as[(String, Long)].collect()
      .map { case (w, f) => (toSymbols(w).toArray, f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // the vocabulary table is driver-bounded here (distinct words of the
    // training sample); the distributed variant runs the same loop with
    // `words` as a cached Dataset — kept local because each iteration's
    // argmax is a one-row reduction either way and the sample is small
    var it = 0
    while (it < numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) it = numMerges
      else {
        val best = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        words = words.map { case (syms, f) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += syms(i) + syms(i + 1); i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, f)
        }
        it += 1
      }
    }
    merges.toSeq
  }

  /** Corpus → distinct-word frequency table (the one corpus-wide pass). */
  def wordFrequencies(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Apply an ordered merge list to one word (greedy, in merge order —
    * standard BPE encoding). */
  def encodeWord(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms = toSymbols(word).toArray
    merges.foreach { case (a, b) =>
      if (syms.length > 1) {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toArray
      }
    }
    syms.toSeq
  }

  /** Per-doc BPE token count via broadcast merges — one map pass. */
  def encode(s: SparkSession, docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val bc = s.sparkContext.broadcast(merges)
    val countUdf = udf((text: String) =>
      text.split("\\s+").iterator.filter(_.nonEmpty)
        .map(w => encodeWord(w, bc.value).length).sum)
    docs.select(col("doc_id"), countUdf(col("text")).as("bpe_tokens"),
      size(split(col("text"), "\\s+")).as("words"))
  }

  /** q78: train 40 merges on a deterministic corpus sample, encode every
    * document, emit per-doc BPE-token vs word counts. No oracle —
    * training is iterative/argmax-based (same class as the sketches);
    * determinism and compression behavior are spec-checked. */
  private val q78 = Q(
    "q78_bpe_tokenize",
    (s, dir) => {
      val docs = T(s, dir, "documents")
      val sample = docs.filter(col("doc_id") % 10 === 0)
      val merges = train(s, wordFrequencies(sample), 40)
      encode(s, docs, merges).orderBy(asc_nulls_first("doc_id"))
    },
    None,
    "BPE: merges trained on a corpus sample, broadcast-encoded token counts (tokenization surface)")

  val all: Seq[Q] = Seq(q78)
}
