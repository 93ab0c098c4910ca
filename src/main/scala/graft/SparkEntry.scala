package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each module contributes `Seq[Q]` (query + optional DuckDB oracle). */
object SparkEntry {

  private def modules: Seq[Q] =
    ops.Relational.all ++ ops.TextOps.all ++ ops.Spatial.all ++
      llm.Dedup.all ++ llm.Ivf.all ++ llm.Sketches.all ++ llm.Bpe.all ++
      llm.Multimodal.all ++ llm.Pipeline.all ++ llm.Curation.all ++ llm.Mmr.all ++
      streaming.Streams.all ++
      sources.Gpkg.all ++ sources.GeoTiff.all ++ ops.Ingest.all ++ ops.Skew.all ++
      ops.ZOrder.all ++ ops.Graph.all ++ ops.Analytics.all ++ ops.Bucketed.all ++
      ops.ZoneMap.all ++ ops.Inverted.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's flagship mangrove report pipeline (SURVEY.md §3.2). */
  def entry(spark: SparkSession): DataFrame =
    queries("q40_flagship_report")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    * Every query first (idempotently) registers the native geo expressions
    * on the incoming session — the driver may pass a session built without
    * GraftExtensions. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map { q =>
      q.name -> { (s: SparkSession, dir: String) =>
        geo.GeoExpressions.ensureRegistered(s)
        q.fn(s, dir)
      }
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
