package graft.llm

import graft.{Q, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The end-to-end "corpus in, training shards out" run — the composition a
  * real 100 TB training-data pipeline executes as ONE job, stitched from
  * the repo's already-plan-audited kernels:
  *
  *   1. [[Dedup.dedupPipeline]]  — MinHash-LSH candidates → exact verify →
  *      connected components → canonical keep flags;
  *   2. leakage-safe split        — split assigned per dedup COMPONENT
  *      (Lee et al. 2022 §5: document-hash splits leak near-identical
  *      text across train/eval), deterministic hash of the component
  *      representative, 80/10/10;
  *   3. [[graft.ops.TextOps.packBySource]] — greedy first-fit packing
  *      within each (split, source) shard;
  *   4. [[graft.ops.Analytics.globalShufflePositions]] — reproducible
  *      global training order over the train split, no single-partition
  *      window.
  *
  * Scale shape: the composition adds NO new shuffle class beyond its
  * stages — dedup flags are components-sized, the split is a map-side
  * projection on the flags, packing shuffles (shard, id, size) triples
  * only, and the order join is id↔id. Text never re-shuffles after the
  * LSH stage. PipelineSpec asserts the three invariants the stages must
  * jointly deliver: no dup component straddles splits, every kept doc
  * lands in exactly one bin exactly once, and the train order is a
  * bijection onto 0..n_train-1. */
object Pipeline {

  /** The q101 planted-duplicate corpus WITH the metadata columns the
    * downstream stages need (source for sharding, n_chars for packing):
    * every 25th doc gets a near-clone (appended tokens, shingle-Jaccard
    * ≈ 0.9), every 40th an exact clone — so dedup has real work and the
    * spec knows exactly which ids must be dropped. */
  def plantedCorpus(s: SparkSession, dir: String): DataFrame = {
    val base = T(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
    val near = base.filter(col("doc_id") % 25 === 0)
      .withColumn("text", concat(col("text"), lit(" appended near dup suffix")))
      .select((col("doc_id") + 300000).as("doc_id"), col("text"),
        col("source"), length(col("text")).cast(LongType).as("n_chars"))
    val exact = base.filter(col("doc_id") % 40 === 0)
      .select((col("doc_id") + 400000).as("doc_id"), col("text"),
        col("source"), col("n_chars"))
    base.unionByName(near).unionByName(exact)
  }

  /** One row per SURVIVING doc: (doc_id, cluster, split, shard, bin,
    * bin_fill, pos) — pos is the global training-order position for
    * train-split docs, null for val/test. */
  def trainingShards(s: SparkSession, docs: DataFrame,
      threshold: Double, cap: Long): DataFrame = {
    // components-sized; materialized once, reused by three consumers
    val flags = Dedup.dedupPipeline(s, docs.select(col("doc_id"), col("text")), threshold)
      .localCheckpoint(true)
    val kept = docs.join(flags.filter(col("keep")), Seq("doc_id"))
      // split keyed on the CLUSTER representative: by construction no
      // component can straddle train/eval
      .withColumn("split",
        when(pmod(xxhash64(col("cluster")), lit(10)) < 8, "train")
          .when(pmod(xxhash64(col("cluster")), lit(10)) === 8, "val")
          .otherwise("test"))
    val packed = graft.ops.TextOps.packBySource(s,
        kept.select(concat(col("split"), lit("|"), col("source")).as("source"),
          col("doc_id"), col("n_chars")), cap)
      .select(col("source").as("shard"), col("doc_id"), col("bin"), col("bin_fill"))
    val order = graft.ops.Analytics.globalShufflePositions(
      kept.filter(col("split") === "train").select(col("doc_id")))
    kept.select(col("doc_id"), col("cluster"), col("split"))
      .join(packed, Seq("doc_id"))
      .join(order, Seq("doc_id"), "left")
      .orderBy(asc_nulls_first("split"), asc_nulls_first("shard"),
        asc_nulls_first("bin"), asc_nulls_first("doc_id"))
  }

  /** q132: the capstone over the planted corpus. Rows-only by design —
    * the composed output has no closed-form SQL twin (LSH banding + CC +
    * greedy packing), but EVERY stage is individually under the oracle
    * (q24-26/q93 LSH+verify, q82/q130 components, q119 split, q106
    * packing, q112 order) and PipelineSpec pins the join invariants. */
  private val q132 = Q(
    "q132_training_shards",
    (s, dir) => trainingShards(s, plantedCorpus(s, dir), 0.8, 4096L),
    None,
    "capstone: dedup -> component-keyed split -> shard packing -> global train order, one composed job")

  val all: Seq[Q] = Seq(q132)
}
