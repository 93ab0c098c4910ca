package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-contract query: a Spark DataFrame builder plus (optionally)
  * the equivalent DuckDB SQL the driver hash-compares against at sf0.01.
  *
  * Determinism conventions (Spark vs DuckDB parity — see SURVEY.md §5):
  *  - Sums over doubles are computed as decimal-cast sums then cast back to
  *    double: exact in both engines, immune to FP summation-order drift.
  *  - Inherently-float aggregates (variance, cosine) are `round(_, k)` in
  *    BOTH engines before compare/rank.
  *  - Timestamps are emitted as formatted strings (Spark parquet stores
  *    UTC-adjusted ts, DuckDB naive ts — strings sidestep the mismatch).
  *  - Every ORDER BY spells out NULLS FIRST/LAST (Spark ASC defaults nulls
  *    first, DuckDB defaults nulls last).
  *  - Integer-ish outputs are cast to BIGINT on both sides (Spark `size()`
  *    is int32, DuckDB `len()` is int64; DuckDB floor() is double, Spark's
  *    is long).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    doc: String = "")

object T {
  /** Scan one driver table (see TESTDATA.md / FIXTURES.md §B).
    *
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark only reads as a
    * raw long under `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    * [[Sessions]]); convert here (ns → µs floor) so queries see a real
    * timestamp column. */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType)
      .map(_ => df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)")))
      .getOrElse(df)
  }
}

/** Central session tuning shared by Verify / Bench / tests. local[N] is a
  * stand-in for a multi-executor cluster: shuffle partitions sized to cores
  * (not the 200 default), AQE on (runtime coalescing + skew-join splitting),
  * nanos parquet read enabled for the events table. */
object Sessions {
  def build(master: String, shufflePartitions: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .withExtensions(new graft.geo.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
