package graft.llm

import graft.{Q, T}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder-prompt surface): media as opaque
  * binary columns + typed metadata, decoded/feature-extracted in batched
  * per-partition passes.
  *
  * The Spark-side plumbing is REAL (schema, typed Dataset, mapPartitions
  * batch shape, partition-parallel decode); the codec itself is a STUB —
  * no image/audio libraries exist in this container, so `decodeStub`
  * derives deterministic fake dimensions + a byte-histogram feature vector
  * from the bytes. Swap `decodeStub` for a real JNI/Java codec at
  * deployment; nothing else changes. */
object Multimodal {

  /** Input row: media blob + declared format ("img"/"audio"). */
  final case class MediaRow(doc_id: Long, format: String, media: Array[Byte])

  /** Output row: decoded metadata + fixed-width feature vector. */
  final case class MediaFeatures(
      doc_id: Long, format: String, n_bytes: Int,
      width: Int, height: Int, features: Array[Double])

  /** STUB decoder — deterministic stand-in for an image/audio codec.
    * Real plumbing boundary: one call per media blob, executed inside a
    * partition iterator (so a real codec could batch/reuse native
    * buffers across rows). */
  def decodeStub(format: String, bytes: Array[Byte]): (Int, Int, Array[Double]) = {
    val h = java.util.Arrays.hashCode(bytes)
    val width = 16 + math.floorMod(h, 1920)
    val height = 16 + math.floorMod(h / 7, 1080)
    val hist = new Array[Double](8)
    var i = 0
    while (i < bytes.length) { hist(math.floorMod(bytes(i), 8)) += 1.0; i += 1 }
    val total = math.max(1.0, bytes.length.toDouble)
    (width, height, hist.map(_ / total))
  }

  /** Media table synthesized from documents (the driver set has no binary
    * column): text bytes stand in for an encoded payload. */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    T(s, dir, "documents")
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0, lit("img")).otherwise(lit("audio")).as("format"),
        col("text").cast("binary").as("media"))
      .as[MediaRow]
  }

  /** Decode + feature-extract, partition-parallel (no shuffle). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init point for a real codec (native context reuse)
      rows.map { r =>
        val (w, h, feats) = decodeStub(r.format, r.media)
        MediaFeatures(r.doc_id, r.format, r.media.length, w, h, feats)
      }
    }
  }

  /** STUB resize: deterministic re-derivation of features at a target
    * geometry (a real codec would rescale pixel data; the plumbing —
    * typed output schema, per-partition batching — is what's real here). */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (_, _, feats) = decodeStub(r.format, r.media)
        MediaFeatures(r.doc_id, r.format, r.media.length, w, h, feats)
      }
    }
  }

  /** STUB frame sampling for "video" payloads: n evenly-spaced byte-range
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
        val (_, _, feats) = decodeStub(r.format, slice)
        FrameFeatures(r.doc_id, i, feats)
      }
    }
  }

  private val q48 = Q(
    "q48_multimodal_features",
    (s, dir) => {
      import s.implicits._
      extractFeatures(mediaTable(s, dir)).toDF()
        .select(col("doc_id"), col("format"), col("n_bytes"), col("width"),
          col("height"), round(element_at(col("features"), 1), 6).as("f0"),
          round(element_at(col("features"), 8), 6).as("f7"))
        .orderBy(asc_nulls_first("doc_id"))
    },
    None,
    "multimodal decode/feature plumbing over binary media columns (STUB codec)")

  val all: Seq[Q] = Seq(q48)
}
