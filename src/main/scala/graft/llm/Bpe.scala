package graft.llm

import graft.{Q, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  /** Hard cap on the driver-side distinct-word vocabulary [[train]] may
    * materialize (the Manifest.guarded pattern). ~1M (word, freq) pairs is
    * tens of MB — comfortable on any driver; a training SAMPLE that
    * produces more distinct words than this is not a sample, it's the
    * corpus, and the documented sampling assumption has been violated.
    * Takes effect mechanically, not by scaladoc promise. */
  val MaxTrainVocab: Int = 1000000

  /** Train `numMerges` merges from a (word, freq) table; returns the
    * ordered merge list. Deterministic: ties on pair count break
    * lexicographically. */
  def train(s: SparkSession, wordFreq: DataFrame, numMerges: Int,
      maxVocab: Int = MaxTrainVocab): Seq[(String, String)] = {
    import s.implicits._
    // limit-capped BEFORE the collect so the driver never holds more than
    // maxVocab+1 rows no matter how mis-sized the input (Long-safe +1)
    val probe = math.min(maxVocab.toLong + 1L, Int.MaxValue.toLong).toInt
    val collected = wordFreq.select(col("word"), col("freq"))
      .as[(String, Long)].limit(probe).collect()
    require(collected.length <= maxVocab,
      s"BPE training vocabulary exceeds $maxVocab distinct words — train " +
        "on a deterministic corpus sample (production BPE trainers " +
        "sample for exactly this reason; see q78's doc_id % 10 sample), " +
        "or raise maxVocab deliberately if the driver heap is sized for it")
    var words = collected
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
        .map(w => encodeWord(w, bc.value).length.toLong).sum)
    docs.select(col("doc_id"), countUdf(col("text")).as("bpe_tokens"),
      size(filter(split(col("text"), "\\s+"), w => w =!= ""))
        .cast(LongType).as("words"))
  }

  val NumMerges = 40

  /** One trainer iteration as chained CTEs (the q204 unrolled-argmax
    * technique applied to the merge loop): from state `u{k}` (wid, freq,
    * syms LIST) —
    *
    *   p{k}:  explode symbols with position, pair up via lead();
    *   pc{k}: pair counts weighted by SAMPLE freq (freq > 0 rows only —
    *          [[train]] counts only the sample's words);
    *   b{k}:  the argmax with [[train]]'s exact tie-break
    *          (n DESC, a ASC, b ASC);
    *   g/f{k}: GREEDY left-to-right match selection — within each
    *          maximal run of consecutive matching positions the merges
    *          start at the 1st, 3rd, 5th… candidate (run = i − rank
    *          groups consecutive candidates; odd rank within the run =
    *          a merge start), exactly the skip-2 scan in [[train]] and
    *          [[encodeWord]] (after a merge the combined token can never
    *          equal the left symbol again, so the scan and the parity
    *          rule pick identical positions);
    *   u{k+1}: rebuild — drop positions consumed by the predecessor's
    *          merge (lag(st) = 1), concatenate at merge starts.
    *
    * An exhausted pair table (b{k} empty) makes the scalar subqueries
    * NULL, every comparison false, and the state a fixpoint — matching
    * the trainer's early stop. */
  private def bpeIterSql(k: Int): String =
    s"""p$k AS MATERIALIZED (
      SELECT wid, freq, i, s, lead(s) OVER (PARTITION BY wid ORDER BY i) AS s2
      FROM (SELECT wid, freq, CAST(t.i AS INTEGER) AS i,
                   syms[CAST(t.i AS INTEGER)] AS s
            FROM u$k, unnest(range(1, len(syms) + 1)) AS t(i))),
    pc$k AS (SELECT s AS a, s2 AS b, SUM(freq) AS n
             FROM p$k WHERE s2 IS NOT NULL AND freq > 0
             GROUP BY s, s2 HAVING SUM(freq) > 0),
    b$k AS MATERIALIZED (SELECT a, b FROM pc$k ORDER BY n DESC, a ASC, b ASC LIMIT 1),
    g$k AS (SELECT wid, freq, i, s, s2, cand,
                   CASE WHEN cand = 1
                        THEN i - ROW_NUMBER() OVER (PARTITION BY wid, cand ORDER BY i)
                   END AS run
            FROM (SELECT *,
                    CASE WHEN s = (SELECT a FROM b$k) AND s2 = (SELECT b FROM b$k)
                         THEN 1 ELSE 0 END AS cand
                  FROM p$k)),
    f$k AS (SELECT wid, freq, i, s, s2,
                   CASE WHEN cand = 1
                         AND ROW_NUMBER() OVER (PARTITION BY wid, run ORDER BY i) % 2 = 1
                        THEN 1 ELSE 0 END AS st
            FROM g$k),
    u${k + 1} AS MATERIALIZED (
      SELECT wid, freq, list(CASE WHEN st = 1 THEN s || s2 ELSE s END ORDER BY i) AS syms
      FROM (SELECT wid, freq, i, s, s2, st,
                   lag(st) OVER (PARTITION BY wid ORDER BY i) AS pst
            FROM f$k)
      WHERE COALESCE(pst, 0) = 0
      GROUP BY wid, freq)"""

  /** The full q78 oracle: state u0 = every DISTINCT corpus word split to
    * characters + the `</w>` marker, freq = its SAMPLE frequency (0 for
    * words outside the doc_id%10 sample — they evolve under the merges
    * but never vote); [[NumMerges]] unrolled iterations; final per-word
    * token count joined back through the corpus word list per doc.
    * ASCII-fixture assumption (shared with the q206 twins): Scala
    * splits words into UTF-16 units and compares them UTF-16-wise,
    * DuckDB by code point / byte — identical on ASCII. */
  private def q78OracleSql: String = {
    val iters = (0 until NumMerges).map(bpeIterSql).mkString(",\n    ")
    s"""WITH dw AS MATERIALIZED (
        SELECT doc_id, w AS wid FROM (
          SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS w
          FROM documents WHERE text IS NOT NULL)
        WHERE len(w) > 0),
      words0 AS (SELECT wid FROM dw GROUP BY wid),
      sfreq AS (SELECT wid, COUNT(*) AS freq FROM dw
                WHERE doc_id % 10 = 0 GROUP BY wid),
      u0 AS MATERIALIZED (SELECT w.wid, COALESCE(s.freq, 0) AS freq,
                    list_append(
                      [w.wid[CAST(j AS INTEGER):CAST(j AS INTEGER)]
                       FOR j IN range(1, length(w.wid) + 1)], '$Eow') AS syms
             FROM words0 w LEFT JOIN sfreq s ON s.wid = w.wid),
      $iters,
      wt AS (SELECT wid, CAST(len(syms) AS BIGINT) AS toks FROM u$NumMerges),
      agg AS (SELECT d.doc_id, SUM(wt.toks) AS bpe_tokens, COUNT(*) AS words
              FROM dw d JOIN wt ON wt.wid = d.wid GROUP BY d.doc_id)
      SELECT doc.doc_id,
             CAST(COALESCE(a.bpe_tokens, 0) AS BIGINT) AS bpe_tokens,
             CAST(COALESCE(a.words, 0) AS BIGINT) AS words
      FROM documents doc LEFT JOIN agg a ON a.doc_id = doc.doc_id
      ORDER BY doc.doc_id ASC NULLS FIRST"""
  }

  /** q78: train [[NumMerges]] merges on a deterministic corpus sample,
    * encode every document, emit per-doc BPE-token vs non-empty word
    * counts. ORACLE-CHECKED (was rows-only through r9): the trainer's
    * whole merge sequence — pair counts, argmax tie-breaks, greedy
    * remerges — and the encode pass are replayed in DuckDB by
    * [[q78OracleSql]]'s unrolled CTE chain, so the hash gate pins the
    * learned vocabulary itself, not just the counts' shape. */
  private val q78 = Q(
    "q78_bpe_tokenize",
    (s, dir) => {
      val docs = T(s, dir, "documents")
      val sample = docs.filter(col("doc_id") % 10 === 0)
      val merges = train(s, wordFrequencies(sample), NumMerges)
      encode(s, docs, merges).orderBy(asc_nulls_first("doc_id"))
    },
    Some(q78OracleSql),
    "BPE: merges trained on a corpus sample, broadcast-encoded token counts; DuckDB replays the merge loop as an unrolled argmax/remerge CTE chain (tokenization surface)")

  val all: Seq[Q] = Seq(q78)
}
