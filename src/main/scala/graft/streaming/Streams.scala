package graft.streaming

import graft.{Q, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Structured Streaming surface (SURVEY.md §2.9 extension): the events
  * table replayed through readStream, windowed-aggregated, and drained
  * into a memory sink. Batch twin = q17_tumbling_hour, which shares the
  * oracle — proving batch/stream agreement on the same input. */
object Streams {

  /** Run a tumbling-window streaming aggregation to completion over the
    * events parquet and return the final (complete-mode) result. */
  def streamTumblingHour(s: SparkSession, dir: String): DataFrame = {
    // raw schema (ts = long under nanosAsLong), NOT T()'s converted one
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    // the file streaming source monitors a DIRECTORY; point it at sfDir
    // restricted to the events file
    val stream = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val agg = stream
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("n_events"), col("sum_value"))
    val name = s"stream_tumbling_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    s.table(name).orderBy(asc_nulls_first("hour"))
  }

  private val q50 = Q(
    "q50_stream_tumbling",
    (s, dir) => streamTumblingHour(s, dir),
    // same oracle as the batch twin q17 — stream must agree with batch
    Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
      COUNT(*) AS n_events, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1 ORDER BY hour ASC NULLS FIRST"""),
    "streaming tumbling-window agg, complete mode; agrees with batch q17 (SURVEY §2.9)")

  val all: Seq[Q] = Seq(q50)
}
