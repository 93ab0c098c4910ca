package graft.llm

import graft.{Q, T}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder-prompt surface): media as opaque
  * binary columns + typed metadata, decoded/feature-extracted in batched
  * per-partition passes.
  *
  * The Spark-side plumbing is real (schema, typed Dataset, mapPartitions
  * batch shape, partition-parallel decode), and so are two codecs: BMP
  * and WAV headers parse for real via [[Codecs]] (width/height resp.
  * sample-rate/channels come from the actual container bytes). Formats
  * without a JVM-parseable container in this environment fall back to
  * `decodeStub` — a deterministic stand-in that is disclosed, not passed
  * off as a codec. Swap the stub for a JNI/Java codec at deployment;
  * nothing else changes. */
object Multimodal {

  /** Input row: media blob + declared format ("img"/"audio"/"bin"). */
  final case class MediaRow(doc_id: Long, format: String, media: Array[Byte])

  /** Output row: decoded metadata + fixed-width feature vector.
    * For WAV payloads width/height carry sample-rate/channels (documented
    * overload of the two geometry slots). `codec` says which decoder ran. */
  final case class MediaFeatures(
      doc_id: Long, format: String, n_bytes: Int,
      width: Int, height: Int, codec: String, features: Array[Double])

  /** STUB decoder — deterministic stand-in for formats with no JVM codec
    * here. One call per media blob, executed inside a partition iterator
    * (so a real codec could batch/reuse native buffers across rows). */
  def decodeStub(format: String, bytes: Array[Byte]): (Int, Int, Array[Double]) = {
    val h = java.util.Arrays.hashCode(bytes)
    val width = 16 + math.floorMod(h, 1920)
    val height = 16 + math.floorMod(h / 7, 1080)
    (width, height, histogram(bytes, 0))
  }

  /** Normalized byte histogram over `bytes[from..)` — the stand-in feature
    * vector for every codec path. */
  private def histogram(bytes: Array[Byte], from: Int): Array[Double] = {
    val h = new Array[Double](8)
    var i = math.min(math.max(0, from), bytes.length)
    val n = math.max(1.0, (bytes.length - i).toDouble)
    while (i < bytes.length) { h(math.floorMod(bytes(i), 8)) += 1.0; i += 1 }
    h.map(_ / n)
  }

  /** Decode dispatch: sniff the container magic, parse for real when it is
    * BMP or WAV, else stub. Returns (width, height, features, codec). */
  def decode(format: String, bytes: Array[Byte]): (Int, Int, Array[Double], String) =
    Codecs.parseBmp(bytes) match {
      case Some(bmp) => (bmp.width, bmp.height, histogram(bytes, bmp.dataOffset), "bmp")
      case None => Codecs.parseWav(bytes) match {
        case Some(w) => (w.sampleRate, w.channels, histogram(bytes, 44), "wav")
        case None =>
          val (wd, ht, f) = decodeStub(format, bytes)
          (wd, ht, f, "stub")
      }
    }

  /** Media table synthesized from documents (the driver set has no binary
    * column): text bytes become REAL BMP and WAV containers for 2/3 of the
    * rows (exercising the actual parsers), raw bytes for the rest
    * (exercising the stub fallback). */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    T(s, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        id % 3 match {
          case 0 => MediaRow(id, "img", Codecs.wrapBmp(payload, 16))
          case 1 => MediaRow(id, "audio", Codecs.wrapWav(payload, 16000, 1))
          case _ => MediaRow(id, "bin", payload)
        }
      }
  }

  /** Decode + feature-extract, partition-parallel (no shuffle). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init point for a real codec (native context reuse)
      rows.map { r =>
        val (w, h, feats, codec) = decode(r.format, r.media)
        MediaFeatures(r.doc_id, r.format, r.media.length, w, h, codec, feats)
      }
    }
  }

  /** Resize to a target geometry: features re-derived from the decoded
    * payload (a real codec would rescale pixel data; the typed output
    * schema and per-partition batching are the real plumbing). */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (_, _, feats, codec) = decode(r.format, r.media)
        MediaFeatures(r.doc_id, r.format, r.media.length, w, h, codec, feats)
      }
    }
  }

  /** Frame sampling for "video" payloads: n evenly-spaced byte-range
    * frames, each with its own feature vector — the exploded (doc, frame)
    * shape a real video pipeline produces. */
  final case class FrameFeatures(doc_id: Long, frame: Int, features: Array[Double])

  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[FrameFeatures] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val len = math.max(1, r.media.length / n)
      (0 until n).map { i =>
        val from = math.min(i * len, r.media.length)
        val until = math.min(from + len, r.media.length)
        val slice = java.util.Arrays.copyOfRange(r.media, from, until)
        FrameFeatures(r.doc_id, i, histogram(slice, 0))
      }
    }
  }

  private val q48 = Q(
    "q48_multimodal_features",
    (s, dir) => {
      import s.implicits._
      extractFeatures(mediaTable(s, dir)).toDF()
        .select(col("doc_id"), col("format"), col("codec"), col("n_bytes"),
          col("width"), col("height"),
          round(element_at(col("features"), 1), 6).as("f0"),
          round(element_at(col("features"), 8), 6).as("f7"))
        .orderBy(asc_nulls_first("doc_id"))
    },
    None,
    "multimodal decode/feature plumbing: real BMP/WAV header codecs + stub fallback")

  /** q153: the resize + frame-sample halves of the multimodal surface as
    * a driver-checked query (q48 covers decode/features): every media row
    * resized to a fixed serving geometry joined against its n=4 sampled
    * frames — the (doc, frame) exploded shape a video/image pipeline
    * materializes before batch inference. Rows-only by design (binary
    * payload features have no SQL oracle); MultimodalSpec pins the codec
    * semantics. Map-only end to end: both legs are mapPartitions over the
    * same scan, the join is doc-keyed on frames already co-partitioned at
    * frame-explosion time — no wide shuffle carries media bytes. */
  private val q153 = Q(
    "q153_multimodal_resize_frames",
    (s, dir) => {
      import s.implicits._
      val media = mediaTable(s, dir)
      val resized = resize(media, 224, 224).toDF()
        .select(col("doc_id"), col("format"), col("n_bytes"),
          col("width"), col("height"),
          round(element_at(col("features"), 1), 6).as("f0"))
      val frames = sampleFrames(media, 4).toDF()
        .select(col("doc_id"), col("frame"),
          round(element_at(col("features"), 1), 6).as("frame_f0"))
      resized.join(frames, "doc_id")
        .orderBy(asc_nulls_first("doc_id"), asc_nulls_first("frame"))
    },
    None,
    "multimodal resize-to-geometry + evenly-spaced frame sampling, exploded (doc, frame) serving shape (builder-prompt multimodal surface)")

  // ---- frame slicing under the ORACLE gate (q222) ----------------------

  /** q222's kernel: [[sampleFrames]]' slicing arithmetic — the SAME
    * floor-division frame length and min-clamped [from, until) bounds —
    * replayed over the text's code points, with the histogram kept as
    * INTEGER bucket counts instead of the normalized doubles the media
    * path emits. q48/q153 stay rows-only because container bytes have no
    * SQL representation; this twin puts the slicing/binning DECISIONS
    * (frame boundaries, mod-8 bucketing, empty-tail frames) under the
    * DuckDB hash gate, where a one-off boundary or a wrong bucket shifts
    * a count and breaks the hash. Code points (not UTF-16 units) so the
    * arithmetic matches DuckDB's character semantics on any input. */
  def charFrameCounts(text: String, n: Int): Seq[(Int, Int, Array[Long])] = {
    val cps = text.codePoints().toArray
    val len = math.max(1, cps.length / n)
    (0 until n).map { i =>
      val from = math.min(i * len, cps.length)
      val until = math.min(from + len, cps.length)
      val h = new Array[Long](8)
      var j = from
      while (j < until) { h(math.floorMod(cps(j), 8)) += 1L; j += 1 }
      (i, until - from, h)
    }
  }

  /** Map-only like q153's frame leg: one UDF pass per row, explode to the
    * (doc, frame) serving shape; the only exchange is the final sort. The
    * every-10th probe slice bounds the oracle's char-unnest replay. */
  private val q222 = Q(
    "q222_frame_slice_oracle",
    (s, dir) => {
      val fr = udf((t: String) => charFrameCounts(t, 4))
      val base = T(s, dir, "documents").filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), explode(fr(col("text"))).as("f"))
      val cols = Seq(col("doc_id"),
        col("f._1").cast("long").as("frame"),
        col("f._2").cast("long").as("frame_chars")) ++
        (0 until 8).map(k => element_at(col("f._3"), k + 1).as(s"c$k"))
      base.select(cols: _*)
        .orderBy(asc_nulls_first("doc_id"), asc_nulls_first("frame"))
    },
    Some("""WITH d AS (
        SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
        FROM documents WHERE doc_id % 10 = 0),
      f AS (
        SELECT doc_id, text, n, fs.frame,
               least(fs.frame * greatest(1, n // 4), n) AS f0,
               least(fs.frame * greatest(1, n // 4) + greatest(1, n // 4), n) AS u0
        FROM d, (SELECT unnest(range(0, 4)) AS frame) fs),
      ch AS (
        SELECT doc_id, frame,
               unnest(range(f0 + 1, u0 + 1)) AS i, text
        FROM f),
      cnt AS (
        SELECT doc_id, frame,
               ord(substr(text, CAST(i AS INTEGER), 1)) % 8 AS b,
               count(*) AS c
        FROM ch GROUP BY 1, 2, 3),
      out AS (
        SELECT f.doc_id, f.frame, f.u0 - f.f0 AS frame_chars,
               CAST(coalesce(MAX(CASE WHEN b = 0 THEN c END), 0) AS BIGINT) AS c0,
               CAST(coalesce(MAX(CASE WHEN b = 1 THEN c END), 0) AS BIGINT) AS c1,
               CAST(coalesce(MAX(CASE WHEN b = 2 THEN c END), 0) AS BIGINT) AS c2,
               CAST(coalesce(MAX(CASE WHEN b = 3 THEN c END), 0) AS BIGINT) AS c3,
               CAST(coalesce(MAX(CASE WHEN b = 4 THEN c END), 0) AS BIGINT) AS c4,
               CAST(coalesce(MAX(CASE WHEN b = 5 THEN c END), 0) AS BIGINT) AS c5,
               CAST(coalesce(MAX(CASE WHEN b = 6 THEN c END), 0) AS BIGINT) AS c6,
               CAST(coalesce(MAX(CASE WHEN b = 7 THEN c END), 0) AS BIGINT) AS c7
        FROM f LEFT JOIN cnt USING (doc_id, frame)
        GROUP BY 1, 2, 3)
      SELECT doc_id, frame, frame_chars, c0, c1, c2, c3, c4, c5, c6, c7
      FROM out
      ORDER BY doc_id ASC NULLS FIRST, frame ASC NULLS FIRST"""),
    "frame-sampling slice arithmetic (floor-division bounds, mod-8 binning, empty tails) under the DuckDB hash gate in integer char space")

  val all: Seq[Q] = Seq(q48, q153, q222)
}
