package graft.streaming

import graft.{Q, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BooleanType, DecimalType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}

/** Structured Streaming surface (SURVEY.md §2.9 extension): the events
  * table replayed through readStream, windowed-aggregated, and drained
  * into a memory sink. Batch twin = q17_tumbling_hour, which shares the
  * oracle — proving batch/stream agreement on the same input. */
object Streams {

  /** Stateful-stream shuffle-partition override. A stateful streaming query
    * commits EVERY state-store partition on EVERY micro-batch (a
    * stream-stream join keeps 4 stores per partition), so the per-batch
    * floor cost scales with `spark.sql.shuffle.partitions` regardless of
    * data volume. These one-shot replays have a handful of micro-batches
    * over modest key cardinality — 8 partitions cuts the fixed commit/IO
    * cost 4× vs the session's batch-tuned 32 while staying parallel. A new
    * checkpoint is created per run, so the partition count is free to
    * differ from the batch session conf. */
  /** tmpfs checkpoint dirs not yet cleaned up — deleted by a JVM shutdown
    * hook so an abnormal exit (uncaught throw, SIGTERM) cannot leak RAM
    * on /dev/shm until reboot. */
  private val pendingCkptDirs =
    java.util.Collections.synchronizedSet(new java.util.HashSet[String]())

  private def deleteRecursively(d: String): Unit = {
    val p = java.nio.file.Paths.get(d)
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
      finally walk.close()
    }
  }

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      pendingCkptDirs.toArray(Array.empty[String]).foreach { d =>
        try deleteRecursively(d) catch { case _: Throwable => () }
      }
    }, "graft-ckpt-cleanup"))
  }

  /** Scale-aware stateful shuffle-partition count. The per-query bases
    * (8, or 4 for the outer interval joins) were tuned at sf0.1, where
    * the fixed per-batch commit floor dominates and fewer stores win.
    * At sf10 the per-partition state WORK dominates instead: the r16
    * interleaved StreamAb A/B (sf10, min of 2 reps) measured the four
    * stream-stream interval joins at 28-35 s on their bases, 16-19 s at
    * 16 partitions, and 18-21 s at 32 — so beyond 32 MB of staged
    * source the count steps to 16, beyond 256 MB to 32 (the local core
    * count; a real cluster raises the cap with its executor count).
    * sf0.1 and sf1 sources sit under 32 MB, so bench-tuned bases are
    * untouched there. */
  private def stateParts(dir: String, base: Int): Int = {
    val mb = Seq("events", "documents")
      .map(t => new java.io.File(s"$dir/$t.parquet").length)
      .max / (1L << 20)
    if (mb > 256) math.max(base, 32)
    else if (mb > 32) math.max(base, 16)
    else base
  }

  private def withStatePartitions[A](s: SparkSession, n0: Int)(body: => A): A = {
    // dev-only A/B override (tools/StreamAb): the per-batch state-commit
    // floor scales with the partition count, so the count is a measured
    // choice, not a constant of nature — production paths never set this
    // (system property first so one JVM can interleave arms)
    val n = sys.props.get("graft.state.parts").orElse(
      sys.env.get("GRAFT_STATE_PARTS")).map(_.toInt).getOrElse(n0)
    val pKey = "spark.sql.shuffle.partitions"
    val nKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val cKey = "spark.sql.streaming.checkpointLocation"
    val oldP = s.conf.get(pKey)
    val oldN = s.conf.get(nKey)
    val oldC = s.conf.getOption(cKey)
    // Checkpoint on tmpfs when available (r8 floor audit): these one-shot
    // replays re-derive all state from the staged source on any restart,
    // so checkpoint durability buys nothing — but EVERY micro-batch
    // commit fsyncs offsets/commit markers per query, a fixed disk-bound
    // floor paid by all ~12 streaming queries. A fresh /dev/shm dir per
    // run (no cross-rep resume; deleted below) keeps the commit protocol
    // identical while making the fsyncs RAM-speed. Production long-lived
    // streams put checkpoints on durable storage — that is a recovery
    // requirement, not part of the operator's cost model.
    val ckBase = {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite)
        Some(java.nio.file.Files
          .createTempDirectory(shm.toPath, "graft_ckpt_").toString)
      else None
    }
    ckBase.foreach { d => pendingCkptDirs.add(d); s.conf.set(cKey, d) }
    // snapshot of already-active queries: anything NEW in the finally
    // block was started by `body` and may hold state under ckBase — stop
    // it before the checkpoint dir is deleted (deleting under a live
    // query corrupts its commit log mid-write)
    val preActive = s.streams.active.map(_.id).toSet
    s.conf.set(pKey, n.toString)
    // No-data micro-batches exist to advance the watermark so APPEND-MODE
    // AGGREGATIONS can finalize their windows. None of this module's
    // queries is one (q50 = complete-mode agg, q65 = eager-emit inner
    // join, q73 = emit-on-arrival dedup, q80 = update-mode state
    // function): their output is complete after the last DATA batch, and
    // the trailing empty batch only re-commits every state store.
    // Measured at sf0.1: disabling cuts q65 4.5→2.5 s, q73 1.9→1.2 s,
    // q50 ~25%, q80 neutral. (The RocksDB provider was measured SLOWER —
    // q65 7.1 s — these one-shot replays carry tiny state, where the
    // default in-memory store's commit beats native writes.) A query that
    // DOES add an append-mode aggregation must restore the default.
    s.conf.set(nKey, "false")
    try body finally {
      s.conf.set(pKey, oldP); s.conf.set(nKey, oldN)
      oldC.fold(s.conf.unset(cKey))(v => s.conf.set(cKey, v))
      // if body threw (or forgot to stop) with a query still running, stop
      // it before deleting its checkpoint out from under it
      s.streams.active.filterNot(q => preActive.contains(q.id))
        .foreach(q => try q.stop() catch { case _: Throwable => () })
      ckBase.foreach { d => deleteRecursively(d); pendingCkptDirs.remove(d) }
    }
  }

  /** Run a tumbling-window streaming aggregation to completion over the
    * events parquet and return the final (complete-mode) result. */
  def streamTumblingHour(s: SparkSession, dir: String): DataFrame = withStatePartitions(s, stateParts(dir, 8)) {
    // raw schema (ts = long under nanosAsLong), NOT T()'s converted one
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    // the file streaming source monitors a DIRECTORY; point it at sfDir
    // restricted to the events file
    val stream = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .transform(graft.Ts.norm)
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

  /** Hopping (sliding) window as a STREAM: `window(ts, 1h, 15m)` over the
    * file source — each event expands to its 4 overlapping windows
    * map-side inside the micro-batch, state is one aggregate row per open
    * window (4× the tumbling count, still window-spine-sized, never
    * event-sized). Complete-mode memory sink holds aggregate rows only. */
  def streamHoppingWindow(s: SparkSession, dir: String): DataFrame = withStatePartitions(s, stateParts(dir, 8)) {
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    val stream = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .transform(graft.Ts.norm)
    val agg = stream
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("n_events"), col("sum_value"))
    val name = s"stream_hopping_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    s.table(name).orderBy(asc_nulls_first("wstart"))
  }

  private val q109 = Q(
    "q109_stream_hopping",
    (s, dir) => streamHoppingWindow(s, dir),
    // same oracle as the batch twin q102 — stream must agree with batch
    Some("""SELECT strftime(make_timestamp(((epoch_us(ts) // 900000000) - k) * 900000000),
               '%Y-%m-%d %H:%M:%S') AS wstart,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM (SELECT ts, value, unnest([0,1,2,3]) AS k FROM events)
      GROUP BY 1 ORDER BY wstart ASC NULLS FIRST"""),
    "streaming hopping-window agg (1h/15m), complete mode; agrees with batch q102 (SURVEY §2.9)")

  /** Gap-based sessionization (30-min inactivity) — the classic stateful
    * streaming analytic, here in its batch form: lag → new-session flag →
    * running sum → per-session agg. Fully window-function shaped, so the
    * DuckDB oracle checks it exactly. Stateful streaming twin:
    * [[statefulUserCounts]] (mapGroupsWithState). */
  private val q52 = Q(
    "q52_sessionization",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(asc_nulls_first("ts_us"))
      T(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
        .withColumn("new_sess",
          when(col("ts_us") - lag(col("ts_us"), 1).over(w) > 1800L * 1000000L, 1)
            .when(lag(col("ts_us"), 1).over(w).isNull, 1)
            .otherwise(0))
        .withColumn("sess_id", sum(col("new_sess"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"),
          min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"))
        .orderBy(asc_nulls_first("user_id"), asc_nulls_first("sess_id"))
    },
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
      f AS (SELECT user_id, ts_us, value,
              CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us ASC NULLS FIRST) IS NULL THEN 1
                   WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us ASC NULLS FIRST) > 1800000000 THEN 1
                   ELSE 0 END AS new_sess
            FROM e),
      g AS (SELECT user_id, ts_us, value,
              CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us ASC NULLS FIRST
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
            FROM f)
      SELECT user_id, sess_id, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             min(ts_us) AS start_us, max(ts_us) AS end_us
      FROM g GROUP BY user_id, sess_id
      ORDER BY user_id ASC NULLS FIRST, sess_id ASC NULLS FIRST"""),
    "gap sessionization: lag/running-sum windows + per-session agg (SURVEY §2.9 extension)")

  /** Stateful streaming: running per-user event counts via
    * mapGroupsWithState (update mode) — the KeyValueGroupedDataset state
    * API over the replayed events stream. */
  def statefulUserCounts(s: SparkSession, dir: String): DataFrame = withStatePartitions(s, stateParts(dir, 8)) {
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    val stream = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .select(col("user_id"))
      .as[Long]
    val counted = stream.groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + rows.size
          state.update(total)
          (user, total)
      }
      .toDF("user_id", "n_events")
    val name = s"stateful_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = counted.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    s.table(name).groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"))
      .orderBy(asc_nulls_first("user_id"))
  }

  /** Stream-stream interval join: "trades" joined to all same-user
    * "quotes" in a 24 h lookback, both sides replayed as watermarked
    * streams (the state-bounding shape: watermark + time-range condition
    * lets Spark drop quote state older than the bound).
    *
    * Scale shape: the raw (trade, quote) pair stream is NEVER collected —
    * each micro-batch is partial-aggregated per trade inside foreachBatch
    * and the (trade_id, n, sum) partials appended to parquet; the final
    * pass merges partials. Append-mode join output emits each pair exactly
    * once across batches, so sum-of-partials is exact; decimal partials
    * keep the merge order-independent. (The previous shape drained the
    * unaggregated pair stream into a driver-resident memory sink —
    * unbounded driver memory at scale, and the slowest bench query.)
    * Timestamps are second-truncated — events.ts carries sub-µs precision
    * Spark floors on read, so the join bound must sit at a granularity the
    * DuckDB oracle agrees on. */
  /** The state-bucket width knob shared by the three interval joins.
    * A trade's 24 h lookback window [t−24h, t] spans at most
    * ceil(24/bucketHours)+1 consecutive buckets, so the trade side
    * probes exactly that many trailing buckets; each qualifying
    * (trade, quote) pair materializes in EXACTLY the quote's own bucket
    * (the quote's ts lies inside the trade's window, hence inside a
    * probed bucket), so the answer is bucket-width-invariant. Narrower
    * buckets = more state keys per hot entity (finer parallelism) at
    * the cost of proportionally more trade probe rows — the per-key
    * state bound is one entity's event rate × (bucketHours + 24 h);
    * see SCALE.md. */
  private def probeCount(bucketHours: Int): Int = {
    require(bucketHours >= 1 && bucketHours <= 24,
      s"bucketHours must be in [1, 24], got $bucketHours")
    math.ceil(24.0 / bucketHours).toInt
  }

  /** Row budget one (user, bucket) state key may hold before the width
    * heuristic narrows the bucket: ~256k quote rows ≈ 13 MB of state and
    * a bounded per-key match loop — comfortable for one state-store
    * partition at executor-memory scale. */
  val DefaultStateKeyRowBudget: Long = 1L << 18

  /** Derive `bucketHours` from the observed hot-entity event rate —
    * SCALE.md's "shrink width until rate × (bucketHours + 24 h) fits one
    * state partition" rule as a function instead of an operator's-manual
    * note. The manual knob on the three interval joins stays as override;
    * any derived width returns q65/q168/q198's exact answers by the
    * width-invariance law (gated by q214/q223/q224 and
    * `BucketedOuterJoinSpec`).
    *
    * The hot rate comes from one CMS sketch pass over (user, hour) keys —
    * the q77 heavy-hitter machinery: map-combinable, sketch-sized driver
    * state, no exact per-key shuffle at plan time. The hottest key's
    * hourly count is upper-bounded WITHOUT enumerating candidates: every
    * key adds its full count to exactly one cell per CMS row, so each
    * row's max cell ≥ the hottest key's count, and the min over rows
    * tightens collision inflation. Over-estimate ⇒ narrower buckets ⇒
    * finer state sharding — errs on the safe side.
    *
    * Returns the WIDEST width in [1, 24] whose per-key state bound
    * `hotHourly × (width + 24 h lookback)` fits the budget (wider = fewer
    * trade probe rows, so narrow only when the hot key forces it); floors
    * at 1 h when even that does not fit — the scheme's finest shard. */
  def deriveBucketHours(s: SparkSession, dir: String,
      maxRowsPerStateKey: Long = DefaultStateKeyRowBudget): Int = {
    import s.implicits._
    import graft.llm.Sketches
    val tokens = T(s, dir, "events").select(concat_ws(":",
      col("user_id").cast("string"),
      floor(unix_micros(date_trunc("second", col("ts"))) /
        lit(3600L * 1000000L)).cast("string")).as("value"))
    val cms = tokens.as[String].select(Sketches.cmsAgg.toColumn).head()
    val hotHourly = (0 until Sketches.Depth)
      .map(r => cms.slice(r * Sketches.Width, (r + 1) * Sketches.Width).max)
      .min
    (24 to 1 by -1).find(w => hotHourly * (w + 24L) <= maxRowsPerStateKey)
      .getOrElse(1)
  }

  private def bucketExpr(bucketHours: Int) =
    floor(expr("unix_micros(cast(tss as timestamp))") /
      (bucketHours.toLong * 3600L * 1000000L)).cast("long")

  private def probeExplode(bucketHours: Int) =
    explode(array((0 to probeCount(bucketHours)).map(i => col("tb") - lit(i.toLong)): _*))

  /** Stream-stream INNER interval join, state sharded on
    * (user, bucketHours-wide time bucket) — never the bare user key.
    * The skew fixture measured why sharding is mandatory: a user holding
    * ~23% of all events makes a bare-key join's per-key matching
    * quadratic in ONE task (24.4 s vs 1.9 s at sf0.1 — ~2.9 M of 3 M
    * pairs in one state partition), and AQE cannot re-plan streaming
    * state. With the bucket in the equi-key, one hot entity's quote
    * state shards across its active buckets; the interval predicate is
    * unchanged, so the answer (and the q65 oracle) is identical by
    * construction for EVERY width — q214 gates that invariance by
    * running width 12 h against the same oracle. At 100×, shrink
    * bucketHours until rate × (bucketHours + 24 h) rows fit one state
    * partition. */
  def streamIntervalJoin(s: SparkSession, dir: String,
      bucketHours: Int = 24): DataFrame = withStatePartitions(s, stateParts(dir, 8)) {
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    def src = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .transform(graft.Ts.norm).withColumn("tss", date_trunc("second", col("ts")))
    val trades = src.filter(pmod(col("event_id"), lit(5)) === 0)
      .select(col("event_id").as("trade_id"), col("user_id"),
        col("tss").as("t_ts"), bucketExpr(bucketHours).as("tb"))
      .withColumn("jb", probeExplode(bucketHours))
      .withWatermark("t_ts", "25 hours")
    val quotes = src.filter(pmod(col("event_id"), lit(5)) =!= 0)
      .select(col("event_id").as("quote_id"), col("user_id").as("q_user"),
        col("tss").as("q_ts"), col("value").as("qval"),
        bucketExpr(bucketHours).as("qb"))
      .withWatermark("q_ts", "25 hours")
    val joined = trades.join(quotes,
      col("user_id") === col("q_user") && col("jb") === col("qb") &&
        col("q_ts") >= col("t_ts") - expr("interval 24 hours") &&
        col("q_ts") <= col("t_ts"))
      .select(col("trade_id"), col("qval"))
    val partialsDir = graft.Scratch.fresh("ij_partials")
    val q = joined.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.groupBy(col("trade_id"))
          .agg(count(lit(1)).as("n"),
            sum(col("qval").cast(DecimalType(18, 2))).as("s"))
          .write.mode("append").parquet(partialsDir)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    s.read.parquet(partialsDir)
      .groupBy(col("trade_id"))
      .agg(sum(col("n")).as("n_quotes"),
        sum(col("s")).cast(DoubleType).as("sum_qval"))
      .orderBy(asc_nulls_first("trade_id"))
  }

  private val q65 = Q(
    "q65_stream_interval_join",
    (s, dir) => streamIntervalJoin(s, dir),
    Some("""WITH e AS (SELECT event_id, user_id, date_trunc('second', ts) AS tss, value FROM events),
      t AS (SELECT event_id AS trade_id, user_id, tss FROM e WHERE event_id % 5 = 0),
      q AS (SELECT event_id, user_id, tss, value FROM e WHERE event_id % 5 <> 0)
      SELECT t.trade_id, COUNT(*) AS n_quotes,
             CAST(SUM(CAST(q.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_qval
      FROM t JOIN q ON t.user_id = q.user_id
                   AND q.tss >= t.tss - INTERVAL 24 HOUR AND q.tss <= t.tss
      GROUP BY t.trade_id ORDER BY trade_id ASC NULLS FIRST"""),
    "stream-stream interval join with watermarks on the (user, 24h-bucket)-sharded state path; oracle-checked vs the batch-equivalent SQL (SURVEY §2.9 extension)")

  private val q214 = Q(
    "q214_interval_join_bucketed",
    (s, dir) => streamIntervalJoin(s, dir, bucketHours = 12),
    q65.oracle, // answer-identical by construction: same interval predicate
    "adaptive-width gate for the sharded interval join: 12h state buckets (3 probe buckets per trade) must produce q65's exact answer — proves the width knob is semantics-free")

  /** Streaming exact dedup: the q20 content-hash path under readStream —
    * the training-data-pipeline ingest shape (dedup new documents against
    * a bounded recent-history window as they arrive).
    *
    * Scale shape: the hash is computed map-side (shuffle carries
    * (doc_id, hash), never text); dropDuplicatesWithinWatermark keys state
    * on the hash and EXPIRES it with the event-time watermark, so state
    * holds one row per distinct hash within the horizon instead of growing
    * with the corpus; deduped batches append to parquet via foreachBatch
    * (nothing corpus-sized is driver-resident). Event time is synthesized
    * deterministically from doc_id — the driver corpus carries no
    * timestamp. */
  def streamDedup(s: SparkSession, dir: String,
      horizon: String = "1 hour"): DataFrame = withStatePartitions(s, stateParts(dir, 8)) {
    val schema = s.read.parquet(s"$dir/documents.parquet").schema
    val outDir = graft.Scratch.fresh("dedup_out")
    val deduped = s.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("hash"))
      .withColumn("ts", expr("timestamp_micros(1700000000000000 + doc_id * 1000000)"))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("hash")
      .select(col("doc_id"), col("hash"))
    val q = deduped.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(outDir)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    // Layout-invariant result: the streaming pass decides the dedup SET
    // (which hashes survive the watermark horizon — the stateful
    // semantics under test), but dropDuplicatesWithinWatermark's
    // per-hash SURVIVOR is arrival-dependent by API contract, and
    // arrival order follows the file-split layout
    // (spark.sql.files.maxPartitionBytes), not doc_id order. So the
    // representative is re-derived as the canonical MIN(doc_id) over
    // each surviving hash group — what a production dedup catalog
    // records — making the output identical under ANY input layout.
    // (distinct() guards the horizon edge: a duplicate arriving after
    // its predecessor's state expired is re-emitted by the operator.)
    val canon = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), md5(col("text").cast("binary")).as("hash"))
      .groupBy(col("hash")).agg(min(col("doc_id")).as("doc_id"))
    s.read.parquet(outDir).select(col("hash")).distinct()
      .join(canon, Seq("hash"))
      .select(col("doc_id"), col("hash"))
      .orderBy(asc_nulls_first("doc_id"))
  }

  private val q73 = Q(
    "q73_stream_dedup",
    (s, dir) => streamDedup(s, dir),
    // Duplicate-robust oracle (the sf1 gate exposed the old "dup-free
    // corpus" assumption: sf0.1 carries 8 duplicate texts, ×10 at sf1):
    // the stream decides the surviving hash SET; the representative is
    // the canonical MIN(doc_id) per hash group on BOTH sides, so the
    // comparison no longer depends on the source being read as a
    // single input partition (arrival order == doc_id order) — it
    // holds under any file-split layout.
    Some("""SELECT MIN(doc_id) AS doc_id, md5(text) AS hash FROM documents
      GROUP BY md5(text)
      ORDER BY doc_id ASC NULLS FIRST"""),
    "streaming exact dedup: watermark-expired hash state + foreachBatch parquet append (dedup surface, SURVEY §2.9)")

  /** Open-session state for [[streamSessionize]]: money carried as exact
    * decimal cents (long) so partial sums merge bit-identically to the
    * batch decimal aggregation. */
  final case class OpenSess(sessId: Long, start: Long, lastTs: Long,
      n: Long, cents: Long)
  final case class SessRow(user_id: Long, sess_id: Long, n_events: Long,
      cents: Long, start_us: Long, end_us: Long)

  /** Gap-based sessionization as a STREAM via flatMapGroupsWithState —
    * q52's stateful twin on the harder state API (the builder prompt's
    * custom-state surface). Each user's open session lives in GroupState;
    * a closed session is emitted exactly once when the 30-min gap fires.
    *
    * End-of-stream flush: a file stream cannot see "no more data", so
    * after the events file drains, a per-user SENTINEL row (gap-breaking
    * timestamp, zero value) is appended as a second file — it closes every
    * user's final real session; the sentinel's own open session is never
    * emitted. This is the replay-determinism variant of production's
    * event-time timeout. */
  def streamSessionize(s: SparkSession, dir: String): DataFrame = withStatePartitions(s, stateParts(dir, 8)) {
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = 1800L * 1000000L
    val src = s"$dir/events.parquet"
    val schema = s.read.parquet(src).schema
    // staging dir: symlink the events file, sentinel file appended later
    val stage = java.nio.file.Paths.get(graft.Scratch.fresh("sess_stage"))
    java.nio.file.Files.createSymbolicLink(
      stage.resolve("events.parquet"), java.nio.file.Paths.get(src))
    val stream = s.readStream.schema(schema).parquet(stage.toString)
      .select(col("user_id"),
        graft.Ts.microsCol(schema).as("ts_us"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
      .as[(Long, Long, Long)]
    val sessions = stream.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Long)], state: GroupState[OpenSess]) =>
          val sorted = rows.toArray.sortBy(r => (r._2, r._3))
          val out = scala.collection.mutable.ArrayBuffer.empty[SessRow]
          var cur = state.getOption.orNull
          sorted.foreach { case (_, ts, cents) =>
            if (cur == null) cur = OpenSess(1L, ts, ts, 1L, cents)
            else if (ts - cur.lastTs > gapUs) {
              out += SessRow(user, cur.sessId, cur.n, cur.cents, cur.start, cur.lastTs)
              cur = OpenSess(cur.sessId + 1, ts, ts, 1L, cents)
            } else cur = cur.copy(lastTs = ts, n = cur.n + 1, cents = cur.cents + cents)
          }
          if (cur != null) state.update(cur)
          out.iterator
      }
    val name = s"sess_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = sessions.toDF().writeStream.outputMode("update")
      .format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      // sentinel file: one gap-breaking row per user closes the last session
      val maxTs = graft.Ts.maxNanos(s, src)
      val sentinel = s.read.parquet(src).select(col("user_id")).distinct()
        .select(schema.fields.map { f =>
          f.name match {
            case "user_id" => col("user_id")
            case "ts" => graft.Ts.litNanos(schema, maxTs + 4000L * 1000000000L).as("ts")
            case "event_id" => lit(-1L).as("event_id")
            case "value" => lit(0.0).as("value")
            case other => lit(null).cast(f.dataType).as(other)
          }
        }: _*)
      sentinel.coalesce(1).write.mode("append").parquet(stage.toString)
      q.processAllAvailable()
    } finally q.stop()
    s.table(name)
      .select(col("user_id"), col("sess_id"), col("n_events"),
        (col("cents") / 100.0).as("sum_value"),
        col("start_us"), col("end_us"))
      .orderBy(asc_nulls_first("user_id"), asc_nulls_first("sess_id"))
  }

  private val q80 = Q(
    "q80_stream_sessionize",
    (s, dir) => streamSessionize(s, dir),
    // shares q52's oracle: the stream must agree with the batch window SQL
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
      f AS (SELECT user_id, ts_us, value,
              CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us ASC NULLS FIRST) IS NULL THEN 1
                   WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us ASC NULLS FIRST) > 1800000000 THEN 1
                   ELSE 0 END AS new_sess
            FROM e),
      g AS (SELECT user_id, ts_us, value,
              CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us ASC NULLS FIRST
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
            FROM f)
      SELECT user_id, sess_id, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             min(ts_us) AS start_us, max(ts_us) AS end_us
      FROM g GROUP BY user_id, sess_id
      ORDER BY user_id ASC NULLS FIRST, sess_id ASC NULLS FIRST"""),
    "flatMapGroupsWithState gap sessionization (stream), sharing q52's oracle (SURVEY §2.9)")

  /** Stream-static join — the one streaming join shape the module lacked
    * (q65 covers stream-stream): arriving events enrich against a STATIC
    * dimension (customer ⋈ nation, pre-joined and broadcast), then
    * aggregate per nation. The static side is planned as a broadcast hash
    * join inside every micro-batch — stateless (no join state store), so
    * the only stateful operator is the complete-mode aggregate, whose
    * state is dimension-sized (25 nations). This is exactly the 100 TB
    * enrichment shape: the fact stream never shuffles for the join. */
  def streamStaticEnrich(s: SparkSession, dir: String): DataFrame = withStatePartitions(s, stateParts(dir, 8)) {
    val dim = T(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(T(s, dir, "nation").select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    val stream = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .transform(graft.Ts.norm)
    val agg = stream.join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
    val name = s"stream_static_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    s.table(name).orderBy(asc_nulls_first("n_name"))
  }

  private val q114 = Q(
    "q114_stream_static_join",
    (s, dir) => streamStaticEnrich(s, dir),
    Some("""SELECT n_name, COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events e
      JOIN customer c ON e.user_id = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n_name ORDER BY n_name ASC NULLS FIRST"""),
    "stream-static broadcast enrichment join + per-nation agg; agrees with the batch join SQL (SURVEY §2.9)")

  /** Merge one micro-batch into the day-partitioned MV at `mvRoot`.
    *
    * Partition-pruned by construction: the batch's partial aggregate
    * names the touched days, and ONLY those `day=` directories are read
    * (listed explicitly — untouched days are never listed, read, or
    * rewritten) and ONLY those partitions are replaced (dynamic
    * partition overwrite). Idempotent on micro-batch replay: Structured
    * Streaming re-runs a failed batch under the same batchId, and a
    * marker file per applied id skips the re-merge. The residual window
    * — crash after the partition commit but before the marker — is
    * exactly the gap a transactional manifest log (Delta/Iceberg) exists
    * to close; for a plain-parquet MV it is documented, not hidden.
    * Exposed for IncrementalMvSpec (synthetic disjoint-day batches,
    * untouched-partition file identity, retry replay). */
  /** MV row layout: matches the partial-aggregate projection ORDER (the
    * driver-side rows are zipped against it) and doubles as the explicit
    * read schema — `day` is the partition column, typed string here so
    * reads skip footer/partition-type inference entirely. */
  private val mvSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("event_type", StringType),
    org.apache.spark.sql.types.StructField("day", StringType),
    org.apache.spark.sql.types.StructField("n_events",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("amt", DecimalType(18, 2))))

  def mvMergeBatch(s: SparkSession, mvRoot: String, batch: DataFrame, batchId: Long): Unit = {
    import java.nio.file.{Files, Paths}
    val marker = Paths.get(mvRoot, "_applied", batchId.toString)
    if (Files.exists(marker)) return // replayed micro-batch: already merged
    // The merge frame is MV-KEY-sized (event_type × touched days), i.e.
    // metadata scale, so it is materialized DRIVER-side: one job for the
    // batch partial, one for the pruned prev∪partial re-aggregate, one
    // local-relation write — and holding the merged rows on the driver
    // dissolves the read-then-overwrite conflict without a checkpoint.
    // (A deployment whose touched-key set per batch were executor-scale
    // would swap the two collects for localCheckpoints — same plan shape,
    // two more jobs per batch.)
    val partialRows = batch
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      // sum(decimal(18,2)) widens to (28,2): cast back so EVERY MV file
      // stores the same physical decimal width (a mixed-width MV fails
      // the merged read's schema reconciliation)
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DecimalType(18, 2)).as("amt"))
      .collect()
    if (partialRows.isEmpty) { // empty micro-batch: nothing to merge
      Files.createDirectories(marker.getParent)
      Files.createFile(marker)
      return
    }
    val partialSchema = mvSchema
    def localDf(rows: Array[org.apache.spark.sql.Row]) =
      s.createDataFrame(java.util.Arrays.asList(rows: _*), partialSchema)
    val days = partialRows.map(_.getString(1)).distinct.sorted
    // ONE reader over exactly the touched day dirs: basePath makes
    // partition discovery reconstitute `day` from the dir names while
    // listing only the given paths (a per-day reader loop costs a full
    // reader init per day per batch — measured 5× slower end to end).
    val prevPaths = days.toSeq.filter(d => Files.exists(Paths.get(mvRoot, s"day=$d")))
      .map(d => s"$mvRoot/day=$d")
    val mergedRows =
      if (prevPaths.isEmpty) partialRows
      else s.read.schema(mvSchema).option("basePath", mvRoot).parquet(prevPaths: _*)
        // explicit schema: no per-batch footer/partition-type inference,
        // and `day` comes back as the string the merge keys on
        .select(col("event_type"), col("day"), col("n_events"), col("amt"))
        .unionByName(localDf(partialRows))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("n_events")).as("n_events"),
          sum(col("amt")).cast(DecimalType(18, 2)).as("amt"))
        .collect()
    // single task writes the touched partitions: one file per day dir
    localDf(mergedRows).coalesce(1).write.partitionBy("day")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(mvRoot)
    Files.createDirectories(marker.getParent)
    Files.createFile(marker)
    ()
  }

  /** Incremental materialized-view maintenance — continuous ingestion's
    * aggregate-upkeep shape: each micro-batch computes a PARTIAL
    * aggregate (map-combinable count + decimal sum per (event_type,
    * day)), merged into a persisted MV physically partitioned by `day`
    * — never re-reading the already-ingested facts, never rewriting an
    * untouched partition (see [[mvMergeBatch]]). Decimal sums make the
    * merge order-independent, so batch boundaries cannot change the
    * result. At 100 TB the per-batch work is O(batch + touched MV
    * partitions); the full-scan equivalent is O(history) per refresh. */
  def incrementalMv(s: SparkSession, dir: String): DataFrame = withStatePartitions(s, stateParts(dir, 8)) {
    val stage = graft.Scratch.dir(s"mv_stage_${dir.hashCode.toHexString}")
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(stage, "_SUCCESS")))
      // time-sliced stage files: continuous ingestion arrives roughly in
      // event-time order, so each micro-batch touches a contiguous band
      // of days — the shape that makes the MV's partition-pruned merge
      // pay off (a randomly-shuffled stage makes every batch touch every
      // day, the pathological worst case for ANY incremental MV)
      s.read.parquet(s"$dir/events.parquet")
        .repartitionByRange(8, col("ts"))
        .write.mode("overwrite").parquet(stage)
    val mvRoot = graft.Scratch.fresh("mv_state")
    val schema = s.read.parquet(stage).schema
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "2").parquet(stage)
      .transform(graft.Ts.norm)
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mvMergeBatch(s, mvRoot, batch, batchId)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(mvRoot, "_applied")))
      // zero-batch stage: the MV was never materialized — empty, typed
      s.sql("SELECT '' AS event_type, '' AS day, 0L AS n_events, 0D AS sum_value")
        .where(lit(false))
    else
      s.read.schema(mvSchema).parquet(mvRoot)
        .select(col("event_type"), col("day"),
          col("n_events"), col("amt").cast(DoubleType).as("sum_value"))
        .orderBy(asc_nulls_first("event_type"), asc_nulls_first("day"))
  }

  private val q117 = Q(
    "q117_incremental_mv",
    (s, dir) => incrementalMv(s, dir),
    // the incrementally-maintained MV must equal the full batch aggregate
    Some("""SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2
      ORDER BY event_type ASC NULLS FIRST, day ASC NULLS FIRST"""),
    "foreachBatch incremental MV maintenance: per-batch partials merged into a versioned MV = full batch agg")

  /** q142: streaming ingest near-dup dedup — the stateful sibling of the
    * batch incremental dedup (q135) and the streaming exact dedup (q73):
    * each arriving micro-batch is classified exact / near / unique
    * against the SIGNATURE INDEX the stream itself maintains (append-only
    * hash, band, and doc tables updated per batch), so every document is
    * deduplicated against exactly what arrived BEFORE it — prefix
    * semantics in arrival order. Intra-batch duplicates are the batch
    * operator's job (q101) and are deliberately not re-checked per batch.
    * Replayed batchIds are skipped via marker files (q117's idempotency
    * pattern), so a foreachBatch retry cannot double-append
    * classifications or index rows.
    *
    * Scale shape: per batch, only the delta computes signatures (once,
    * checkpointed) and probes the standing band table via the bucket
    * equi-join of [[graft.llm.Dedup.classifyAgainstIndex]]; the index
    * tables grow append-only exactly like a production signature store.
    * The stage replays four arrival waves (corpus → near clones → exact
    * clones → reversed-unique) written with strictly increasing mtimes,
    * so FileStreamSource's oldest-first order makes the expectation
    * exact: originals classify unique, every planted clone finds its
    * source. */
  def streamIncrementalDedup(s: SparkSession, corpus0: DataFrame,
      threshold: Double, stageKey: Option[String] = None): DataFrame =
    streamIngestDedup(s, corpus0, stageKey,
      hType = StringType, // md5 hex since r14 (the oracle-replayable collapse hash)
      oSchema = StructType(Seq(StructField("doc_id", LongType),
        StructField("kind", StringType), StructField("dup_of", LongType),
        StructField("jaccard", DoubleType))),
      sigFn = graft.llm.Dedup.deltaSignatures,
      auxFn = (batch, _) => batch,
      classifyFn = (batch, idxH, idxB, idxAux, sigs) =>
        graft.llm.Dedup.classifyAgainstIndex(batch, idxH, idxB, idxAux,
          threshold, precomputedSigs = Some(sigs)),
      indexHB = graft.llm.Dedup.indexFrames)

  /** q211: [[streamIncrementalDedup]]'s EXACT twin — the identical
    * streaming harness ([[streamIngestDedup]]: same four staged waves,
    * same per-batch index append, same idempotency markers), with the
    * mod-p probe kernel ([[graft.llm.Dedup.classifyAgainstIndexExact]])
    * in place of the 64-bit one, so the PREFIX semantics themselves —
    * every doc classified against exactly what arrived before it — sit
    * under the DuckDB hash gate. The aux index holds (doc_id, xs)
    * shingle sets instead of raw text (the verify step's input, exactly
    * what a production signature store materializes). */
  def streamIncrementalDedupExact(s: SparkSession, corpus0: DataFrame,
      stageKey: Option[String] = None): DataFrame =
    streamIngestDedup(s, corpus0, stageKey,
      hType = StringType,
      oSchema = StructType(Seq(StructField("doc_id", LongType),
        StructField("kind", StringType), StructField("dup_of", LongType),
        StructField("jq", LongType))),
      sigFn = graft.llm.Dedup.deltaSignaturesExact,
      auxFn = (_, sigs) => sigs.select(col("doc_id"), col("xs")),
      classifyFn = (batch, idxH, idxB, idxAux, sigs) =>
        graft.llm.Dedup.classifyAgainstIndexExact(batch, idxH, idxB, idxAux,
          precomputedSigs = Some(sigs)),
      indexHB = graft.llm.Dedup.indexFramesExact,
      auxSchema = Some(StructType(Seq(StructField("doc_id", LongType),
        StructField("xs", ArrayType(LongType))))))

  /** The shared streaming ingest-dedup harness behind q142 and its q211
    * oracle twin: stage the four arrival waves (corpus → near clones →
    * exact clones → reversed-unique, strictly increasing mtimes so
    * FileStreamSource replays them oldest-first), then per micro-batch
    * sign once, classify against the standing (hash, band, aux) index
    * tables, append classifications and index rows, and skip replayed
    * batchIds via marker files (q117's idempotency pattern). The twin
    * differs ONLY in the kernel closures it plugs in. */
  private def streamIngestDedup(s: SparkSession, corpus0: DataFrame,
      stageKey: Option[String],
      hType: org.apache.spark.sql.types.DataType,
      oSchema: StructType,
      sigFn: DataFrame => DataFrame,
      auxFn: (DataFrame, DataFrame) => DataFrame,
      classifyFn: (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) => DataFrame,
      indexHB: DataFrame => (DataFrame, DataFrame),
      auxSchema: Option[StructType] = None): DataFrame = withStatePartitions(s, 8) {
    import java.nio.file.{Files, Paths}
    val corpus = corpus0.select(col("doc_id"), col("text"))
    // the staged arrival waves are pure functions of the input corpus, so
    // keyed callers (q142/q211: keyed by sf dir) write them once per JVM —
    // q117's stage-memo pattern; the INDEX state below is always fresh
    val stage = stageKey.map(k => graft.Scratch.dir(s"sid_stage_$k"))
      .getOrElse(graft.Scratch.fresh("sid_stage"))
    if (!Files.exists(Paths.get(stage, "_staged"))) {
      // a dir without the marker is a partially-staged leftover: the
      // append-mode wave writes below are not restartable, so restage
      stageKey.foreach(k => graft.Scratch.fresh(s"sid_stage_$k"))
      // span-derived family offsets (the Dedup r14 rule: constant
      // offsets collided past span 100k — caught by the sf10 law gate)
      val span = graft.llm.Dedup.docSpan(corpus)
      val waves = Seq(
        corpus,
        corpus.filter(col("doc_id") % 20 === 0)
          .select((col("doc_id") + lit(2L * span)).as("doc_id"),
            concat(col("text"), lit(" appended near dup suffix")).as("text")),
        corpus.filter(col("doc_id") % 50 === 0)
          .select((col("doc_id") + lit(3L * span)).as("doc_id"), col("text")),
        corpus.filter(col("doc_id") % 100 === 0)
          .select((col("doc_id") + lit(4L * span)).as("doc_id"),
            array_join(reverse(split(col("text"), " ")), " ").as("text")))
      waves.foreach(_.coalesce(1).write.mode("append").parquet(stage))
      Files.createFile(Paths.get(stage, "_staged"))
    }
    val root = graft.Scratch.fresh("sid_state")
    val idxH = s"$root/idx_h"; val idxB = s"$root/idx_b"
    val idxA = s"$root/idx_a"; val outDir = s"$root/out"
    val hSchema = StructType(Seq(StructField("doc_id", LongType), StructField("h", hType)))
    val bSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("band", IntegerType), StructField("bh", LongType)))
    val aSchema = auxSchema.getOrElse(corpus.schema)
    def readOrEmpty(path: String, schema: StructType) =
      if (Files.exists(Paths.get(path))) s.read.schema(schema).parquet(path)
      else s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val q = s.readStream.schema(corpus.schema).option("maxFilesPerTrigger", "1").parquet(stage)
      .writeStream.outputMode("append")
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val marker = Paths.get(root, "_applied", batchId.toString)
        if (!Files.exists(marker)) {
          // one materialization, three consumers; LAZY since r16 — the
          // classify job materializes it, saving one action per micro-batch
          val batch = batch0.localCheckpoint(false)
          // signatures compute ONCE per batch, shared by probe + index append
          val sigs = sigFn(batch)
          classifyFn(batch,
              readOrEmpty(idxH, hSchema), readOrEmpty(idxB, bSchema),
              readOrEmpty(idxA, aSchema), sigs)
            .write.mode("append").parquet(outDir)
          val (h, b) = indexHB(sigs)
          h.write.mode("append").parquet(idxH)
          b.write.mode("append").parquet(idxB)
          auxFn(batch, sigs).write.mode("append").parquet(idxA)
          Files.createDirectories(marker.getParent)
          Files.createFile(marker)
          ()
        }
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    s.read.schema(oSchema).parquet(outDir).orderBy(asc_nulls_first("doc_id"))
  }

  /** q148: streaming drift monitor — the in-stream sibling of the batch
    * drift audit q140 (same metric, same oracle). Orders arrive in four
    * waves in ARBITRARY order (split by key, not by time — monitoring
    * state must be insensitive to arrival order); each micro-batch folds
    * its per-(column, value) ref/cur counts into a versioned parquet
    * state table (value-cardinality-sized, like q117's MV), and the TVD
    * report is computed from the FINAL maintained state — proving the
    * incrementally-maintained counts reproduce the batch answer exactly.
    * Replayed batchIds overwrite their own version (marker files), so a
    * foreachBatch retry is a no-op — q117's idempotency pattern.
    *
    * Scale shape: per batch one map-combinable stack+groupBy (shuffle
    * carries (col, val, partials)); the state merge unions two
    * value-cardinality-sized frames — never the fact stream; the final
    * report is q140's broadcast-totals projection over the tiny state. */
  def streamDrift(s: SparkSession, orders0: DataFrame,
      stageKey: Option[String] = None): DataFrame = withStatePartitions(s, 8) {
    import java.nio.file.{Files, Paths}
    val stage = stageKey.map(k => graft.Scratch.dir(s"drift_stage_$k"))
      .getOrElse(graft.Scratch.fresh("drift_stage"))
    if (!Files.exists(Paths.get(stage, "_staged"))) {
      stageKey.foreach(k => graft.Scratch.fresh(s"drift_stage_$k"))
      val src = orders0.select(col("o_orderkey"), col("o_orderstatus"),
        col("o_orderpriority"),
        (col("o_orderdate") < to_timestamp(lit("1998-01-01"))).as("is_ref"))
      (0 until 4).foreach { w =>
        src.filter(pmod(col("o_orderkey"), lit(4)) === w).drop("o_orderkey")
          .coalesce(1).write.mode("append").parquet(stage)
      }
      Files.createFile(Paths.get(stage, "_staged"))
      ()
    }
    val root = graft.Scratch.fresh("drift_state")
    val inSchema = StructType(Seq(StructField("o_orderstatus", StringType),
      StructField("o_orderpriority", StringType), StructField("is_ref", BooleanType)))
    val stSchema = StructType(Seq(StructField("col_name", StringType),
      StructField("val", StringType), StructField("n_ref", LongType),
      StructField("n_cur", LongType)))
    def readState(v: Long): DataFrame =
      if (v >= 0 && Files.exists(Paths.get(s"$root/v$v")))
        s.read.schema(stSchema).parquet(s"$root/v$v")
      else s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], stSchema)
    val q = s.readStream.schema(inSchema).option("maxFilesPerTrigger", "1").parquet(stage)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val marker = Paths.get(root, "_applied", batchId.toString)
        if (!Files.exists(marker)) {
          val batchCounts = batch
            .selectExpr("stack(2, 'o_orderstatus', o_orderstatus, " +
              "'o_orderpriority', o_orderpriority) AS (col_name, val)", "is_ref")
            .groupBy(col("col_name"), col("val"))
            .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
              sum(when(col("is_ref"), 0L).otherwise(1L)).as("n_cur"))
          readState(batchId - 1).unionByName(batchCounts)
            .groupBy(col("col_name"), col("val"))
            .agg(sum(col("n_ref")).as("n_ref"), sum(col("n_cur")).as("n_cur"))
            .coalesce(1).write.mode("overwrite").parquet(s"$root/v$batchId")
          Files.createDirectories(marker.getParent)
          Files.createFile(marker)
          ()
        }
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val applied = Option(Paths.get(root, "_applied").toFile.list())
      .map(_.map(_.toLong)).getOrElse(Array.empty[Long])
    val counts = readState(if (applied.isEmpty) -1L else applied.max)
    val totals = counts.groupBy(col("col_name"))
      .agg(sum(col("n_ref")).as("ref_n"), sum(col("n_cur")).as("cur_n"))
    counts.join(broadcast(totals), "col_name")
      .withColumn("diff_bp",
        abs(expr("(10000 * n_ref) div ref_n") - expr("(10000 * n_cur) div cur_n")))
      .groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_values"),
        min(col("ref_n")).as("ref_n"), min(col("cur_n")).as("cur_n"),
        max(col("diff_bp")).as("max_diff_bp"),
        expr("sum(diff_bp) div 2").as("tvd_bp"))
      .orderBy(asc_nulls_first("col_name"))
  }

  /** q148's oracle is q140's batch SQL verbatim — the stream must land on
    * the batch answer (the q50/q17 twin convention, applied to
    * monitoring state). */
  private val q148 = Q(
    "q148_stream_drift",
    (s, dir) => streamDrift(s, T(s, dir, "orders"), Some(dir.hashCode.toHexString)),
    graft.ops.Analytics.all.find(_.name == "q140_segment_drift").flatMap(_.oracle),
    "streaming drift monitor: per-batch count folding into versioned state, final TVD == q140's batch answer (monitoring surface)")

  /** q154: watermark late-data audit — how many rows per hour window
    * actually SURVIVE streaming aggregation when events arrive out of
    * order. Events arrive in four key-split waves (each wave's max
    * timestamp ≈ the global max, so after wave 0 the watermark sits one
    * hour below the stream's end and most older rows in later waves are
    * late); a far-future flush row then pushes the watermark past every
    * real window so append mode emits them all.
    *
    * The ORACLE replays Spark's watermark semantics from first principles
    * in SQL, including the one-trigger propagation delay measured here:
    * the watermark FILTERING batch b reflects event times only through
    * batch b−2 (the new max from batch b−1 is computed at its commit and
    * takes effect one trigger later), and a row survives iff its WINDOW
    * END is strictly above that watermark. Both the window-end rule and
    * the lag were established empirically against this exact stage (lag-1
    * replay: 1919 groups; Spark: 2781; lag-2 replay: 2781, hash-green).
    * A pipeline that trusts streaming counts as exact needs precisely
    * this audit.
    *
    * Scale shape: one watermarked tumbling aggregation (state =
    * window×type cardinality); the audit adds nothing beyond the agg
    * itself. Requires the final no-data micro-batch (append-mode
    * finalization), re-enabled inside this query's scope only —
    * [[withStatePartitions]] disables it for every other stream here. */
  def watermarkLateAudit(s: SparkSession, events0: DataFrame,
      stageKey: Option[String] = None): DataFrame = withStatePartitions(s, 8) {
    import java.nio.file.{Files, Paths}
    s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    val stage = stageKey.map(k => graft.Scratch.dir(s"wm_stage_$k"))
      .getOrElse(graft.Scratch.fresh("wm_stage"))
    if (!Files.exists(Paths.get(stage, "_staged"))) {
      stageKey.foreach(k => graft.Scratch.fresh(s"wm_stage_$k"))
      val src = events0.select(col("event_id"), col("ts"), col("event_type"))
      (0 until 4).foreach { w =>
        src.filter(pmod(col("event_id"), lit(4)) === w)
          .coalesce(1).write.mode("append").parquet(stage)
      }
      // flush wave: one synthetic far-future row (bounded 1-row collect)
      val mx = events0.agg(max(col("ts"))).head().getTimestamp(0)
      val flushTs = new java.sql.Timestamp(mx.getTime + 30L * 24 * 3600 * 1000)
      val flushRow = s.createDataFrame(
        java.util.Collections.singletonList(
          org.apache.spark.sql.Row(-1L, flushTs, "__flush")),
        StructType(Seq(StructField("event_id", LongType), StructField("ts",
          org.apache.spark.sql.types.TimestampType), StructField("event_type", StringType))))
      flushRow.coalesce(1).write.mode("append").parquet(stage)
      Files.createFile(Paths.get(stage, "_staged"))
      ()
    }
    val inSchema = StructType(Seq(StructField("event_id", LongType),
      StructField("ts", org.apache.spark.sql.types.TimestampType),
      StructField("event_type", StringType)))
    val name = "wm_late_audit"
    val q = s.readStream.schema(inSchema).option("maxFilesPerTrigger", "1").parquet(stage)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("cnt"))
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    s.table(name).filter(col("event_type") =!= "__flush")
      .orderBy(asc_nulls_first("window_start"), asc_nulls_first("event_type"))
  }

  private val q154 = Q(
    "q154_watermark_late_audit",
    (s, dir) => watermarkLateAudit(s, T(s, dir, "events"), Some(dir.hashCode.toHexString)),
    Some("""WITH a AS (SELECT event_id, ts, event_type, event_id % 4 AS b FROM events),
      bm AS (SELECT b, max(ts) AS mx FROM a GROUP BY b),
      wm AS (SELECT b, max(mx) OVER (ORDER BY b ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING)
               - INTERVAL 1 HOUR AS wm FROM bm),
      k AS (SELECT a.ts, a.event_type FROM a JOIN wm USING (b)
            WHERE wm.wm IS NULL OR date_trunc('hour', a.ts) + INTERVAL 1 HOUR > wm.wm)
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
             event_type, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM k GROUP BY 1, 2
      ORDER BY window_start ASC NULLS FIRST, event_type ASC NULLS FIRST"""),
    "watermark late-drop audit: staged out-of-order arrival, oracle replays the pre-batch watermark rule from first principles (streaming-exactness surface)")

  /** q142's oracle (direct since r14, the kernel switch in [[graft.llm
    * .Dedup]]): q211's wave-scoped prefix replay with the PRODUCTION
    * arithmetic — md5 exact precedence, 64-min/16-band probe with
    * per-wave hot caps, string-shingle float jaccard ≥ 0.8 on identical
    * rounded doubles, (jaccard DESC, corpus_id ASC) argmax. */
  private def q142OracleSql: String = s"""WITH alldocs AS (
      SELECT doc_id, 0 AS wave, text FROM documents
      UNION ALL
      SELECT doc_id + 2 * (SELECT MAX(doc_id) + 1 FROM documents), 1,
             text || ' appended near dup suffix'
      FROM documents WHERE doc_id % 20 = 0
      UNION ALL
      SELECT doc_id + 3 * (SELECT MAX(doc_id) + 1 FROM documents), 2, text
      FROM documents WHERE doc_id % 50 = 0
      UNION ALL
      SELECT doc_id + 4 * (SELECT MAX(doc_id) + 1 FROM documents), 3,
             array_to_string(list_reverse(string_split(text, ' ')), ' ')
      FROM documents WHERE doc_id % 100 = 0),
      ${graft.llm.Dedup.modpSigCtes("alldocs", "a_",
        graft.llm.Dedup.NumHashes, graft.llm.Dedup.BandRows)},
      bw AS (SELECT b.doc_id, a.wave, b.band, b.bh
             FROM a_banded b JOIN alldocs a USING (doc_id)),
      hsh AS (SELECT doc_id, wave, md5(text) AS h FROM alldocs),
      ex AS (SELECT d.doc_id, MIN(c.doc_id) AS dup_of
             FROM hsh d JOIN hsh c ON c.h = d.h AND c.wave < d.wave
             GROUP BY d.doc_id),
      hot AS (SELECT w.w, b.band, b.bh FROM (SELECT unnest([1, 2, 3]) AS w) w
              JOIN bw b ON b.wave < w.w
              GROUP BY w.w, b.band, b.bh
              HAVING COUNT(*) > ${graft.llm.Dedup.MaxBucketSize}),
      cand AS (
        SELECT DISTINCT d.doc_id AS delta_id, c.doc_id AS corpus_id
        FROM bw d
        JOIN bw c ON c.band = d.band AND c.bh = d.bh AND c.wave < d.wave
        LEFT JOIN hot h ON h.w = d.wave AND h.band = d.band AND h.bh = d.bh
        LEFT JOIN ex ON ex.doc_id = d.doc_id
        WHERE h.w IS NULL AND ex.doc_id IS NULL),
      ssh AS (SELECT d.doc_id,
               CASE WHEN len(d.ws) >= 3 THEN
                 list_distinct([array_to_string(d.ws[i:i+2], ' ')
                                FOR i IN generate_series(1, len(d.ws) - 2)])
               ELSE [d.text] END AS sh
              FROM (SELECT doc_id, text, string_split(text, ' ') AS ws
                    FROM alldocs) d),
      nearq AS (
        SELECT c.delta_id, c.corpus_id,
               round(CAST(len(list_intersect(ds.sh, cs.sh)) AS DOUBLE)
                     / len(list_distinct(list_concat(ds.sh, cs.sh))), 4) AS jaccard
        FROM cand c JOIN ssh ds ON ds.doc_id = c.delta_id
        JOIN ssh cs ON cs.doc_id = c.corpus_id),
      near AS (
        SELECT delta_id AS doc_id, corpus_id AS dup_of, jaccard
        FROM (SELECT *, row_number() OVER (PARTITION BY delta_id
                ORDER BY jaccard DESC, corpus_id ASC) AS rk
              FROM nearq WHERE jaccard >= 0.8)
        WHERE rk = 1),
      cls AS (SELECT doc_id, 'exact' AS kind, dup_of, CAST(1.0 AS DOUBLE) AS jaccard FROM ex
              UNION ALL SELECT doc_id, 'near', dup_of, jaccard FROM near)
      SELECT a.doc_id, COALESCE(c.kind, 'unique') AS kind, c.dup_of, c.jaccard
      FROM alldocs a LEFT JOIN cls c ON c.doc_id = a.doc_id
      ORDER BY a.doc_id ASC NULLS FIRST"""

  private lazy val q142 = Q(
    "q142_stream_incremental_dedup",
    (s, dir) => streamIncrementalDedup(s, T(s, dir, "documents"), 0.8,
      Some(dir.hashCode.toHexString)),
    Some(q142OracleSql),
    "streaming ingest near-dup dedup: per-batch classify vs the self-maintained signature index (prefix arrival semantics, idempotent batches); prefix decisions hash-gated")

  /** q211's oracle replays the PREFIX semantics from first principles:
    * every doc carries its wave number, the exact hit and the band
    * probe only see strictly-earlier waves, and the per-wave hot-bucket
    * cap counts exactly the index rows standing when that wave's batch
    * probed. The kernel arithmetic is q210's (md5 precedence, mod-p
    * bands, integer Jaccard, quantized argmax). */
  private def q211OracleSql: String = s"""WITH alldocs AS (
      SELECT doc_id, 0 AS wave, text FROM documents
      UNION ALL
      SELECT doc_id + 2 * (SELECT MAX(doc_id) + 1 FROM documents), 1,
             text || ' appended near dup suffix'
      FROM documents WHERE doc_id % 20 = 0
      UNION ALL
      SELECT doc_id + 3 * (SELECT MAX(doc_id) + 1 FROM documents), 2, text
      FROM documents WHERE doc_id % 50 = 0
      UNION ALL
      SELECT doc_id + 4 * (SELECT MAX(doc_id) + 1 FROM documents), 3,
             array_to_string(list_reverse(string_split(text, ' ')), ' ')
      FROM documents WHERE doc_id % 100 = 0),
      ${graft.llm.Dedup.modpSigCtes("alldocs", "a_")},
      bw AS (SELECT b.doc_id, a.wave, b.band, b.bh
             FROM a_banded b JOIN alldocs a USING (doc_id)),
      hsh AS (SELECT doc_id, wave, md5(text) AS h FROM alldocs),
      ex AS (SELECT d.doc_id, MIN(c.doc_id) AS dup_of
             FROM hsh d JOIN hsh c ON c.h = d.h AND c.wave < d.wave
             GROUP BY d.doc_id),
      hot AS (SELECT w.w, b.band, b.bh FROM (SELECT unnest([1, 2, 3]) AS w) w
              JOIN bw b ON b.wave < w.w
              GROUP BY w.w, b.band, b.bh
              HAVING COUNT(*) > ${graft.llm.Dedup.MaxBucketSize}),
      cand AS (
        SELECT DISTINCT d.doc_id AS delta_id, c.doc_id AS corpus_id
        FROM bw d
        JOIN bw c ON c.band = d.band AND c.bh = d.bh AND c.wave < d.wave
        LEFT JOIN hot h ON h.w = d.wave AND h.band = d.band AND h.bh = d.bh
        LEFT JOIN ex ON ex.doc_id = d.doc_id
        WHERE h.w IS NULL AND ex.doc_id IS NULL),
      iw AS (SELECT c.delta_id, c.corpus_id, COUNT(*) AS i
             FROM cand c JOIN a_shing sd ON sd.doc_id = c.delta_id
             JOIN a_shing sc ON sc.doc_id = c.corpus_id AND sc.x = sd.x
             GROUP BY c.delta_id, c.corpus_id),
      nearq AS (
        SELECT c.delta_id, c.corpus_id,
               COALESCE(iw.i, 0) AS i, dn.n + cn.n - COALESCE(iw.i, 0) AS u
        FROM cand c
        LEFT JOIN iw ON iw.delta_id = c.delta_id AND iw.corpus_id = c.corpus_id
        JOIN a_cnts dn ON dn.doc_id = c.delta_id
        JOIN a_cnts cn ON cn.doc_id = c.corpus_id),
      near AS (
        SELECT delta_id AS doc_id, corpus_id AS dup_of, (1000000 * i) // u AS jq
        FROM (SELECT *, row_number() OVER (PARTITION BY delta_id
                ORDER BY (1000000 * i) // u DESC, corpus_id ASC) AS rk
              FROM nearq WHERE 5 * i >= 4 * u)
        WHERE rk = 1),
      cls AS (SELECT doc_id, 'exact' AS kind, dup_of, CAST(1000000 AS BIGINT) AS jq FROM ex
              UNION ALL SELECT doc_id, 'near', dup_of, jq FROM near)
      SELECT a.doc_id, COALESCE(c.kind, 'unique') AS kind, c.dup_of, c.jq
      FROM alldocs a LEFT JOIN cls c ON c.doc_id = a.doc_id
      ORDER BY a.doc_id ASC NULLS FIRST"""

  private val q211 = Q(
    "q211_stream_incremental_dedup_oracle",
    (s, dir) => streamIncrementalDedupExact(s, T(s, dir, "documents"),
      Some(dir.hashCode.toHexString)),
    Some(q211OracleSql),
    "streaming ingest dedup twin: q142's wave-staged prefix classification with the q210 mod-p kernel — arrival-prefix semantics, index maintenance, and per-wave hot caps all hash-gated")

  /** Stream-stream LEFT OUTER interval join — q65's missing-side
    * completion: trades with NO qualifying quote in the 24 h lookback
    * must still emit (with nulls), which an inner join silently drops.
    * Spark emits the null-padded row only when the watermark passes the
    * trade's eviction bound, so a bounded replay needs the watermark
    * pushed past ALL real rows at end-of-stream: two sentinel files
    * (one trade + one surviving quote each, user_id −1 so they join
    * nothing) are appended as extra micro-batches — two, because the
    * watermark is computed from the PREVIOUS batch's max event time.
    * This is the replay-determinism variant of production's continuous
    * arrival (same pattern as q80's sentinel).
    *
    * State shards on (user, bucketHours bucket) exactly like
    * [[streamIntervalJoin]]. The bucketing is sound for the inner
    * matches (a pair materializes in exactly the quote's own bucket),
    * but an exploded trade holds probeCount+1 left-side state rows, so
    * a bucket with no qualifying quote emits a spurious null row even
    * when ANOTHER bucket matched. The reconciliation is the aggregation
    * the query already publishes: per-trade `count(qval)` / `sum(qval)`
    * ignore nulls, so a matched trade's stray null rows contribute
    * nothing and a globally unmatched trade's all-null rows still read
    * (0, NULL) — LEFT JOIN aggregate semantics hold with zero extra
    * passes, at any bucket width (q223 gates width 12 h on q168's
    * oracle).
    *
    * Scale shape: state bounded by watermark + the time-range
    * condition, per-batch partial aggregation in foreachBatch (the raw
    * pair stream is never driver-resident), decimal partials merged
    * exactly. */
  // 4 state partitions, not the module's usual 8: the OUTER joins keep 4
  // state stores per partition on BOTH sides and re-commit them across the
  // two sentinel flush batches, so the fixed commit cost dominates —
  // measured at sf0.1 (local[8], warm): q168 6.3 s → 4.6 s, q198
  // 10.0 s → 5.0 s going 8 → 4.
  def streamLeftOuterJoin(s: SparkSession, dir: String,
      bucketHours: Int = 24): DataFrame = withStatePartitions(s, stateParts(dir, 4)) {
    val src0 = s"$dir/events.parquet"
    val schema = s.read.parquet(src0).schema
    val stage = java.nio.file.Paths.get(graft.Scratch.fresh("loj_stage"))
    java.nio.file.Files.createSymbolicLink(
      stage.resolve("events.parquet"), java.nio.file.Paths.get(src0))
    def src = s.readStream.schema(schema).parquet(stage.toString)
      .transform(graft.Ts.norm).withColumn("tss", date_trunc("second", col("ts")))
    val trades = src.filter(pmod(col("event_id"), lit(5)) === 0)
      .select(col("event_id").as("trade_id"), col("user_id"),
        col("tss").as("t_ts"), bucketExpr(bucketHours).as("tb"))
      .withColumn("jb", probeExplode(bucketHours))
      .withWatermark("t_ts", "25 hours")
    val quotes = src.filter(pmod(col("event_id"), lit(5)) =!= 0 && col("value") >= 8.0)
      .select(col("event_id").as("quote_id"), col("user_id").as("q_user"),
        col("tss").as("q_ts"), col("value").as("qval"),
        bucketExpr(bucketHours).as("qb"))
      .withWatermark("q_ts", "25 hours")
    val joined = trades.join(quotes,
      col("user_id") === col("q_user") && col("jb") === col("qb") &&
        col("q_ts") >= col("t_ts") - expr("interval 24 hours") &&
        col("q_ts") <= col("t_ts"),
      "leftOuter")
      .select(col("trade_id"), col("qval"))
    val partialsDir = graft.Scratch.fresh("loj_partials")
    val q = joined.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.groupBy(col("trade_id"))
          .agg(count(col("qval")).as("n"),
            sum(col("qval").cast(DecimalType(18, 2))).as("s"))
          .write.mode("append").parquet(partialsDir)
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      val maxTs = graft.Ts.maxNanos(s, src0)
      for (i <- 1 to 2) {
        val farNs = maxTs + (4000L + i) * 3600L * 1000000000L
        // two rows: event_id −5 lands in the trade branch (pmod 0), −1 in
        // the quote branch (pmod 4, value passes the ≥8 filter); user −1
        // matches nothing on either side
        val sentinel = s.range(2).select(schema.fields.map { f =>
          f.name match {
            case "event_id" => when(col("id") === 0, lit(-5L)).otherwise(lit(-1L)).as("event_id")
            case "ts" => graft.Ts.litNanos(schema, farNs).as("ts")
            case "user_id" => lit(-1L).as("user_id")
            case "value" => lit(9.99).as("value")
            case other => lit(null).cast(f.dataType).as(other)
          }
        }: _*)
        sentinel.write.mode("append").parquet(stage.toString)
        q.processAllAvailable()
      }
    } finally q.stop()
    s.read.parquet(partialsDir)
      .filter(col("trade_id") >= 0)
      .groupBy(col("trade_id"))
      .agg(sum(col("n")).cast(LongType).as("n_quotes"),
        sum(col("s")).cast(DoubleType).as("sum_qval"))
      .orderBy(asc_nulls_first("trade_id"))
  }

  private val q168 = Q(
    "q168_stream_left_outer_join",
    (s, dir) => streamLeftOuterJoin(s, dir),
    Some("""WITH e AS (SELECT event_id, user_id, date_trunc('second', ts) AS tss, value FROM events),
      t AS (SELECT event_id AS trade_id, user_id, tss FROM e WHERE event_id % 5 = 0),
      q AS (SELECT event_id, user_id, tss, value FROM e
            WHERE event_id % 5 <> 0 AND value >= 8.0)
      SELECT t.trade_id, CAST(COUNT(q.event_id) AS BIGINT) AS n_quotes,
             CAST(SUM(CAST(q.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_qval
      FROM t LEFT JOIN q ON t.user_id = q.user_id
           AND q.tss >= t.tss - INTERVAL 24 HOUR AND q.tss <= t.tss
      GROUP BY t.trade_id ORDER BY trade_id ASC NULLS FIRST"""),
    "stream-stream LEFT OUTER interval join on the (user, 24h-bucket)-sharded state path: unmatched trades emit null-padded on watermark passage (sentinel-flushed at end-of-stream); oracle is the batch LEFT JOIN")

  /** q198: stream-stream FULL OUTER interval join — the last cell of the
    * streaming join matrix (q65 inner, q168 left): BOTH sides' unmatched
    * rows emit null-padded when the watermark passes their eviction
    * bound — unmatched quotes surface here, which even the left join
    * silently drops. Same sentinel end-of-stream flush as q168 (both
    * branches carry a sentinel row; both excluded from the partials).
    * The result is the reconciliation summary: matched pairs, orphans
    * per side, and value totals — exactly the audit a trade/quote (or
    * clickstream/conversion) reconciliation job publishes. Oracle is the
    * batch FULL JOIN aggregated the same way.
    *
    * State shards on (user, bucketHours bucket) like
    * [[streamIntervalJoin]]. Quote-side orphan semantics survive
    * sharding EXACTLY (a quote lives in one bucket and every potential
    * pair materializes in that bucket, so null-trade rows are true
    * orphans); the trade side needs reconciliation: an exploded trade
    * emits a null-quote row per matchless BUCKET, so "unmatched trade"
    * must be decided on the trade's TOTAL match count, not row-shape.
    * The per-batch partials are therefore trade-KEYED (trade_id,
    * matches, matched value) plus a global quote-orphan row; the final
    * pass counts trades whose summed matches are zero. One extra
    * trade-cardinality aggregation buys per-bucket state parallelism
    * under hot entities, at any width (q224 gates width 12 h on q198's
    * oracle). */
  def streamFullOuterJoin(s: SparkSession, dir: String,
      bucketHours: Int = 24): DataFrame = withStatePartitions(s, stateParts(dir, 4)) {
    val src0 = s"$dir/events.parquet"
    val schema = s.read.parquet(src0).schema
    val stage = java.nio.file.Paths.get(graft.Scratch.fresh("foj_stage"))
    java.nio.file.Files.createSymbolicLink(
      stage.resolve("events.parquet"), java.nio.file.Paths.get(src0))
    def src = s.readStream.schema(schema).parquet(stage.toString)
      .transform(graft.Ts.norm).withColumn("tss", date_trunc("second", col("ts")))
    val trades = src.filter(pmod(col("event_id"), lit(5)) === 0)
      .select(col("event_id").as("trade_id"), col("user_id"),
        col("tss").as("t_ts"), bucketExpr(bucketHours).as("tb"))
      .withColumn("jb", probeExplode(bucketHours))
      .withWatermark("t_ts", "25 hours")
    val quotes = src.filter(pmod(col("event_id"), lit(5)) =!= 0 && col("value") >= 8.0)
      .select(col("event_id").as("quote_id"), col("user_id").as("q_user"),
        col("tss").as("q_ts"), col("value").as("qval"),
        bucketExpr(bucketHours).as("qb"))
      .withWatermark("q_ts", "25 hours")
    val joined = trades.join(quotes,
      col("user_id") === col("q_user") && col("jb") === col("qb") &&
        col("q_ts") >= col("t_ts") - expr("interval 24 hours") &&
        col("q_ts") <= col("t_ts"),
      "fullOuter")
      .select(col("trade_id"), col("quote_id"), col("qval"))
    val tDir = graft.Scratch.fresh("foj_tpart")
    val qDir = graft.Scratch.fresh("foj_qpart")
    val q = joined.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.persist() // two consumers; don't re-run the join
        try {
          b.filter(col("trade_id").isNotNull && col("trade_id") >= 0)
            .groupBy(col("trade_id"))
            .agg(count(col("quote_id")).as("n"),
              sum(col("qval").cast(DecimalType(18, 2))).as("s"))
            .write.mode("append").parquet(tDir)
          b.filter(col("trade_id").isNull && col("quote_id") >= 0)
            .agg(count(lit(1)).as("uq"),
              sum(col("qval").cast(DecimalType(18, 2))).as("ov"))
            .write.mode("append").parquet(qDir)
        } finally { b.unpersist(); () }
      }
      .start()
    try {
      q.processAllAvailable()
      val maxTs = graft.Ts.maxNanos(s, src0)
      for (i <- 1 to 2) {
        val farNs = maxTs + (4000L + i) * 3600L * 1000000000L
        val sentinel = s.range(2).select(schema.fields.map { f =>
          f.name match {
            case "event_id" => when(col("id") === 0, lit(-5L)).otherwise(lit(-1L)).as("event_id")
            case "ts" => graft.Ts.litNanos(schema, farNs).as("ts")
            case "user_id" => lit(-1L).as("user_id")
            case "value" => lit(9.99).as("value")
            case other => lit(null).cast(f.dataType).as(other)
          }
        }: _*)
        sentinel.write.mode("append").parquet(stage.toString)
        q.processAllAvailable()
      }
    } finally q.stop()
    val perTrade = s.read.parquet(tDir)
      .groupBy(col("trade_id"))
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"))
    val tAgg = perTrade.agg(
      sum(col("n")).as("n_pairs"),
      sum(when(col("n") === 0, 1L).otherwise(0L)).as("n_unmatched_trades"),
      sum(col("s")).cast(DoubleType).as("matched_value"))
    val qAgg = s.read.parquet(qDir).agg(
      sum(col("uq")).as("n_unmatched_quotes"),
      sum(col("ov")).cast(DoubleType).as("orphan_value"))
    tAgg.crossJoin(qAgg) // two 1-row aggregates
      .select(col("n_pairs"), col("n_unmatched_trades"), col("n_unmatched_quotes"),
        col("matched_value"), col("orphan_value"))
  }

  private val q198 = Q(
    "q198_stream_full_outer_join",
    (s, dir) => streamFullOuterJoin(s, dir),
    Some("""WITH e AS (SELECT event_id, user_id, date_trunc('second', ts) AS tss, value FROM events),
      t AS (SELECT event_id AS trade_id, user_id, tss FROM e WHERE event_id % 5 = 0),
      q AS (SELECT event_id AS quote_id, user_id, tss, value FROM e
            WHERE event_id % 5 <> 0 AND value >= 8.0),
      j AS (SELECT t.trade_id, q.quote_id, q.value
            FROM t FULL JOIN q ON t.user_id = q.user_id
                 AND q.tss >= t.tss - INTERVAL 24 HOUR AND q.tss <= t.tss)
      SELECT CAST(COUNT(*) FILTER (WHERE trade_id IS NOT NULL AND quote_id IS NOT NULL) AS BIGINT)
               AS n_pairs,
             CAST(COUNT(*) FILTER (WHERE quote_id IS NULL) AS BIGINT) AS n_unmatched_trades,
             CAST(COUNT(*) FILTER (WHERE trade_id IS NULL) AS BIGINT) AS n_unmatched_quotes,
             CAST(SUM(CASE WHEN trade_id IS NOT NULL THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
               AS matched_value,
             CAST(SUM(CASE WHEN trade_id IS NULL THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
               AS orphan_value
      FROM j"""),
    "stream-stream FULL OUTER interval join on the (user, 24h-bucket)-sharded state path: both sides' orphans emit on watermark passage (sentinel-flushed); reconciliation summary matches the batch FULL JOIN")

  private val q223 = Q(
    "q223_left_outer_join_bucketed",
    (s, dir) => streamLeftOuterJoin(s, dir, bucketHours = 12),
    q168.oracle, // answer-identical: nulls are absorbed by count/sum per trade
    "adaptive-width gate for the sharded LEFT OUTER interval join: 12h state buckets, per-bucket null rows reconciled by the null-skipping per-trade aggregate — same oracle as q168")

  private val q224 = Q(
    "q224_full_outer_join_bucketed",
    (s, dir) => streamFullOuterJoin(s, dir, bucketHours = 12),
    q198.oracle, // answer-identical: trade-keyed partials decide orphanhood on total matches
    "adaptive-width gate for the sharded FULL OUTER interval join: 12h state buckets + trade-keyed reconciliation partials — same oracle as q198")

  /** Streaming mergeable distinct-count sketch — the streaming face of the
    * q225 KMV/theta family in the q162 daily-rollup shape: the stream
    * maintains ONE ≤K-long sketch per (event_type, day) inside the state
    * store (bounded state no matter how many users a day brings — this is
    * what replaces streaming countDistinct, whose state is user-sized),
    * and the readout merges day sketches per type into θ, the retained
    * count, and the p/θ distinct estimate. The daily rollup is LOSSLESS
    * by the theta merge property (every global K-smallest value is within
    * its day's K-smallest, so K-smallest-of-union-of-parts = K-smallest-
    * of-union), which is exactly what the oracle exploits: DuckDB replays
    * the sketch DIRECTLY over all events — a lost daily partial, a
    * double-inserted cross-day duplicate, or a broken cap merge shifts θ
    * or the retained count and breaks the hash. Exact distinct rides
    * along (q162's pattern) to expose the estimation error. */
  def streamKmvDistinct(s: SparkSession, dir: String): DataFrame = withStatePartitions(s, stateParts(dir, 8)) {
    import graft.llm.Sketches
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    val stream = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .transform(graft.Ts.norm)
    val kmvU = udaf(Sketches.kmvAggRows, org.apache.spark.sql.Encoders.scalaLong)
    val daily = stream
      .filter(assert_true(abs(col("user_id")) < lit(2147483648L),
        lit("user_id magnitude >= 2^31: kmv hash product would overflow int64")).isNull)
      .select(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        ((lit(2654435761L) * abs(col("user_id")) + lit(98765L))
          % lit(Sketches.KmvP)).as("h"))
      .groupBy(col("event_type"), col("day"))
      .agg(kmvU(col("h")).as("sk"))
    val name = s"stream_kmv_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = daily.writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    // n_types × n_days sketch rows, ≤ K longs each — sketch-sized by
    // construction (the q225 bounded-collect rationale)
    val rows = s.table(name).collect()
    val merged = rows.groupBy(_.getString(0)).toSeq.map { case (t, rs) =>
      val sk = rs.map(_.getAs[scala.collection.Seq[Long]]("sk").toArray)
        .foldLeft(Array.emptyLongArray)(Sketches.kmvMerge)
      val theta = Sketches.kmvTheta(sk)
      val nRet = sk.count(_ < theta).toLong
      (t, rs.length.toLong, theta, nRet, nRet * Sketches.KmvP / theta)
    }
    import s.implicits._
    val est = merged.toDF("event_type", "n_days", "theta", "n_retained", "est_distinct")
    val exact = T(s, dir, "events").groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    est.join(broadcast(exact), Seq("event_type"))
      .select(col("event_type"), col("n_days"), col("theta"), col("n_retained"),
        col("est_distinct"), col("exact_users"))
      .orderBy(asc_nulls_first("event_type"))
  }

  private val q226 = Q(
    "q226_stream_kmv_distinct",
    (s, dir) => streamKmvDistinct(s, dir),
    Some(s"""WITH hx AS (
        SELECT DISTINCT event_type AS t,
               (2654435761 * abs(user_id) + 98765) % ${graft.llm.Sketches.KmvP} AS h
        FROM events),
      r AS (SELECT t, h, row_number() OVER (PARTITION BY t ORDER BY h) AS rn,
                   COUNT(*) OVER (PARTITION BY t) AS cnt
            FROM hx),
      th AS (SELECT t, CASE WHEN max(cnt) >= ${graft.llm.Sketches.KmvK}
                            THEN max(CASE WHEN rn = ${graft.llm.Sketches.KmvK} THEN h END)
                            ELSE ${graft.llm.Sketches.KmvP} END AS theta
             FROM r WHERE rn <= ${graft.llm.Sketches.KmvK} GROUP BY t),
      vc AS (SELECT r.t, CAST(COUNT(*) AS BIGINT) AS n_retained
             FROM r JOIN th USING (t)
             WHERE r.rn <= ${graft.llm.Sketches.KmvK} AND r.h < th.theta
             GROUP BY r.t),
      dy AS (SELECT event_type AS t,
               CAST(COUNT(DISTINCT strftime(ts, '%Y-%m-%d')) AS BIGINT) AS n_days
             FROM events GROUP BY 1),
      ex AS (SELECT event_type AS t,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
             FROM events GROUP BY 1)
      SELECT th.t AS event_type, dy.n_days, th.theta,
             COALESCE(vc.n_retained, 0) AS n_retained,
             COALESCE(vc.n_retained, 0) * ${graft.llm.Sketches.KmvP} // th.theta AS est_distinct,
             ex.exact_users
      FROM th
      JOIN dy ON dy.t = th.t
      JOIN ex ON ex.t = th.t
      LEFT JOIN vc ON vc.t = th.t
      ORDER BY event_type ASC NULLS FIRST"""),
    "streaming KMV distinct sketch: bounded per-(type,day) state, lossless daily rollup merge, hash-gated against a direct DuckDB sketch replay")

  val all: Seq[Q] = Seq(q50, q52, q65, q73, q80, q109, q114, q117, q142, q211, q214, q148, q154,
    q168, q198, q223, q224, q226)
}
