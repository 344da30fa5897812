package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming-family registry: the Structured Streaming operators
  * (sessionization, dedup, interval joins, stream-static enrichment,
  * the foreachBatch upsert sink, the streaming Misra–Gries sketch)
  * plus the batch legs of the sessionization triangle
  * (x_batch_sessions, x_session_window) and the native sliding
  * window. Split out of ExtensionQueries (round 8) purely for
  * navigation — registry contents and oracle rules are unchanged. */
private[graft] object StreamQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_stream_sessions" -> ((s, dir) => streamBatchParity(s, dir)),
    "x_stream_dedup" -> ((s, dir) => streamDedup(s, dir)),
    "x_stream_heavy" -> ((s, dir) => streamHeavyHitters(s, dir)),
    "x_stream_interval_join" -> ((s, dir) => streamIntervalParity(s, dir)),
    "x_stream_outer_join" -> ((s, dir) => streamOuterIntervalParity(s, dir)),
    "x_stream_static_join" -> ((s, dir) => streamStaticJoin(s, dir)),
    "x_stream_upsert" -> ((s, dir) => streamUpsertSink(s, dir)),
    "x_session_window" -> ((s, dir) =>
      // Spark's NATIVE session_window operator over the same events —
      // the third leg of the sessionization triangle (hand-built batch
      // twin in x_batch_sessions, stream parity in x_stream_sessions),
      // each checked against an independent SQL oracle. Note native
      // session windows end at last_event + gap (exclusive end).
      Tables.events(s, dir)
        .groupBy(col("user_id"),
          session_window(col("ts"), "60 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_millis(col("w.start")).as("start_ms"),
          unix_millis(col("w.end")).as("end_ms"),
          col("n_events"))
        .orderBy(col("user_id"), col("start_ms"))),
    "x_sliding_window" -> ((s, dir) =>
      // Spark's native SLIDING event-time window (60-minute windows
      // every 15 minutes — each event lands in 4 overlapping windows);
      // the oracle replays the epoch-aligned window-start arithmetic.
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "60 minutes", "15 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(unix_millis(col("w.start")).as("start_ms"), col("n_events"))
        .orderBy(col("start_ms"))),
    "x_batch_sessions" -> ((s, dir) =>
      // Full value-checked batch sessionization (the parity bit in
      // x_stream_sessions compares stream vs batch; THIS query checks
      // the batch sessions themselves against an independent SQL
      // twin). One shuffle on the user key.
      graft.streaming.StreamOps.sessionizeBatch(
          Tables.events(s, dir), "user_id", "ts", gapMinutes = 60)
        .select(col("user_id"), col("start_ms"), col("end_ms"),
          col("n_events").cast("long").as("n_events"))
        .orderBy(col("user_id"), col("start_ms")))
  )

  /** x_stream_sessions: batch ≡ stream sessionization parity bit — RUNS
    * the bounded AvailableNow flatMapGroupsWithState sessionizer (the
    * streaming machinery is fully exercised), which must emit EXACTLY
    * the sessions the batch lag+cumsum twin predicts
    * (StreamOps.sessionizeBatchEmitted — gap-closed sessions plus
    * watermark-timed-out finals). Compared as multisets of
    * (user_id, start, end, n_events); the bit is 1 iff the symmetric
    * difference is empty. */
  private def streamBatchParity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.streaming.StreamOps
    val ev = StreamOps.eventsStream(s, dir)
      .select(col("user_id"), col("ts")).as[StreamOps.SessionEvent]
    val streamed = StreamOps.withScaledStatePartitions(s,
        StreamOps.eventsBytes(s, dir))(StreamOps.runAvailableNow(
        StreamOps.sessionize(ev, gapMinutes = 60).toDF(),
        "stream_sessions_parity",
        org.apache.spark.sql.streaming.OutputMode.Append()))
      .select(col("user_id"), unix_millis(col("start")).as("start_ms"),
        unix_millis(col("end")).as("end_ms"), col("n_events"))
    val batch = StreamOps.sessionizeBatchEmitted(
      Tables.events(s, dir), "user_id", "ts", gapMinutes = 60)
    QueryKit.multisetParityBit(streamed, batch, "stream_parity_ok")
  }

  /** x_stream_interval_join: batch ≡ stream parity bit for the
    * stream-stream interval join (StreamOps.intervalJoin). The bounded
    * AvailableNow run joins click events to same-user view events from
    * the preceding 10 minutes; an inner interval join emits every
    * match it ever sees (watermarks only bound STATE), so on a bounded
    * input the emitted set must equal the batch inequality join
    * exactly. Compared as multisets of (click_id, view_id). */
  private def streamIntervalParity(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamOps
    def sideS(t: String, idAs: String) =
      StreamOps.eventsStream(s, dir).where(col("event_type") === t)
        .select(col("user_id"), col("ts"), col("event_id").as(idAs))
    val joined = StreamOps.intervalJoin(
      sideS("click", "click_id"), sideS("view", "view_id"),
      "user_id", "ts", windowMinutes = 10, watermark = "60 minutes")
      .select(col("click_id"), col("view_id"))
    val streamed = StreamOps.withScaledStatePartitions(s,
      StreamOps.eventsBytes(s, dir))(
      StreamOps.runAvailableNow(joined, "stream_interval_parity",
        org.apache.spark.sql.streaming.OutputMode.Append()))
    val ev = Tables.events(s, dir)
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val v = ev.where(col("event_type") === "view")
      .select(col("user_id").as("uid_r"), col("ts").as("ts_r"),
        col("event_id").as("view_id"))
    val batch = c.join(v,
        col("user_id") === col("uid_r") && col("ts_r") <= col("ts") &&
          col("ts_r") >= col("ts") - expr("INTERVAL 10 MINUTES"))
      .select(col("click_id"), col("view_id"))
    QueryKit.multisetParityBit(streamed, batch, "interval_parity_ok")
  }

  /** x_stream_outer_join: batch ≡ stream parity for the LEFT-OUTER
    * stream-stream interval join — the harder emission contract:
    * matched pairs flow like the inner join, but unmatched clicks
    * only emit (with a null view_id) once the GLOBAL watermark —
    * min over both sources' max event time, minus the delay — passes
    * their event time, because until then a matching view could still
    * arrive. StreamOps.intervalJoinLeftOuterEmitted expresses exactly
    * that subset in batch; the bit is 1 iff the multisets agree. */
  private def streamOuterIntervalParity(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamOps
    def sideS(t: String, idAs: String) =
      StreamOps.eventsStream(s, dir).where(col("event_type") === t)
        .select(col("user_id"), col("ts"), col("event_id").as(idAs))
    val joined = StreamOps.intervalJoin(
      sideS("click", "click_id"), sideS("view", "view_id"),
      "user_id", "ts", windowMinutes = 10, watermark = "60 minutes",
      joinType = "left_outer")
      .select(col("click_id"), col("view_id"))
    val streamed = StreamOps.withScaledStatePartitions(s,
      StreamOps.eventsBytes(s, dir))(
      StreamOps.runAvailableNow(joined, "stream_outer_interval_parity",
        org.apache.spark.sql.streaming.OutputMode.Append()))
    val ev = Tables.events(s, dir)
    def sideB(t: String, idAs: String) =
      ev.where(col("event_type") === t)
        .select(col("user_id"), col("ts"), col("event_id").as(idAs))
    val emitted = StreamOps.intervalJoinLeftOuterEmitted(
      sideB("click", "click_id"), sideB("view", "view_id"),
      "user_id", "ts", windowMinutes = 10, watermarkMinutes = 60)
      .select(col("click_id"), col("view_id"))
    QueryKit.multisetParityBit(streamed, emitted, "outer_parity_ok")
  }

  /** x_stream_dedup: STREAMING exact dedup (StreamOps.dedup over the
    * events file stream) counted after a bounded AvailableNow run —
    * checked against an EXACT oracle (DuckDB's COUNT(DISTINCT
    * event_id)), not just a parity bit: the streaming path must land
    * on the same distinct cardinality as any batch engine. */
  private def streamDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamOps
    val deduped = StreamOps.dedup(
      StreamOps.eventsStream(s, dir).select(col("event_id"), col("ts")),
      Seq("event_id"))
    StreamOps.withScaledStatePartitions(s, StreamOps.eventsBytes(s, dir))(
        StreamOps.runAvailableNow(deduped, "stream_dedup_q",
          org.apache.spark.sql.streaming.OutputMode.Append()))
      .agg(count(lit(1)).as("n_unique"))
  }

  /** x_stream_heavy: the Misra–Gries TypedImperativeAggregate running
    * INSIDE Structured Streaming — per-day windowed sketch over the
    * event-type stream; the custom aggregate's buffers serialize into
    * the state store like any builtin, which is the property this
    * query pins (a sketch that can't stream can't run on an unbounded
    * pipeline). With k=8 ≥ the 5-type vocabulary MG never evicts, so
    * the candidate maps ARE the exact per-day type counts and the
    * oracle is a plain GROUP BY replay — the same k≥vocab exactness
    * MisraGriesSpec proves; k < vocab behavior is pinned there too. */
  private def streamHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamOps
    val sketched = StreamOps.eventsStream(s, dir)
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(call_function("graft_mg_topk", col("event_type"), lit(8)).as("cand"))
      .select(col("w.start").cast("date").as("day"), col("cand"))
    // Safe under partition scaling: k=8 ≥ the 5-type vocabulary, so
    // the MG candidates are EXACT counts whatever the merge grouping.
    StreamOps.withScaledStatePartitions(s, StreamOps.eventsBytes(s, dir))(
      StreamOps.runAvailableNow(sketched, "stream_heavy_q"))
      .select(col("day"), explode(col("cand")).as(Seq("event_type", "n")))
      .orderBy(col("day"), col("event_type"))
  }

  /** x_stream_static_join: stream-static enrichment — the events file
    * stream joins a broadcast static dimension (customer segment) per
    * microbatch, the standard "enrich a stream with reference data"
    * pattern. Stateless (no watermark/state store needed for
    * stream-static inner joins); the bounded AvailableNow emission
    * must match the plain batch join, which is what the oracle runs. */
  private def streamStaticJoin(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamOps
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val joined = StreamOps.eventsStream(s, dir)
      .join(broadcast(cust), col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("c_mktsegment"))
    StreamOps.runAvailableNow(joined, "stream_static_join",
        org.apache.spark.sql.streaming.OutputMode.Append())
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .orderBy(col("c_mktsegment"))
  }

  /** x_stream_upsert: the streaming MERGE sink pattern — update-mode
    * daily counts flow through foreachBatch, and each micro-batch's
    * changed days upsert into a state table (graft.operators.Upsert),
    * exactly how a streaming pipeline maintains a continuously-
    * refreshed aggregate table. The final state must equal the batch
    * daily counts, which is what the oracle runs.
    *
    * The per-batch localCheckpoint keeps the state's lineage from
    * nesting across batches. It stores blocks only in executor
    * storage — fine for this bounded sink demo; a production deploy
    * would MERGE into a transactional table instead (see
    * Dedup.nearDupClusters for the executor-loss caveat). */
  private def streamUpsertSink(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamOps
    import graft.operators.Upsert
    val daily = StreamOps.dailyCounts(StreamOps.eventsStream(s, dir))
    var state: DataFrame = null
    StreamOps.withScaledStatePartitions(s, StreamOps.eventsBytes(s, dir)) {
      val q = StreamOps.foreachBatchSink(daily, "stream_upsert_sink") { (batch, _) =>
        val b = batch.localCheckpoint(true)
        state = if (state == null) b
          else Upsert.upsert(state, b, Seq("day")).localCheckpoint(true)
      }
      q.awaitTermination()
    }
    if (state == null) daily.sparkSession.emptyDataFrame
    else state.orderBy(col("day"))
  }

  // ----------------------------------------------------------------- oracle

  val oracle: Map[String, String] = Map(
    "x_stream_sessions" -> "SELECT CAST(1 AS BIGINT) AS stream_parity_ok",
    "x_stream_interval_join" -> "SELECT CAST(1 AS BIGINT) AS interval_parity_ok",
    "x_stream_outer_join" -> "SELECT CAST(1 AS BIGINT) AS outer_parity_ok",
    // The STREAMING dedup must land on the exact distinct cardinality.
    "x_stream_dedup" ->
      "SELECT CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_unique FROM events",
    // Stream-static enrichment: the oracle is the plain batch join.
    "x_stream_static_join" ->
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
        | FROM events JOIN customer ON user_id = c_custkey
        | GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin.replaceAll("\n", " "),
    // The streaming upsert sink's final state must equal the batch
    // daily counts — same oracle as q_daily_counts.
    "x_stream_upsert" ->
      "SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1 ORDER BY day",
    // k >= vocabulary makes the MG candidate map the exact census
    // (no evictions), so the streaming sketch replays as GROUP BY.
    // NULL filter matches the engine path: the MG aggregate skips null
    // items, while a bare GROUP BY would emit a NULL group (same
    // defensive filter as x_count_min's oracle).
    "x_stream_heavy" ->
      """SELECT CAST(ts AS DATE) AS day, event_type, CAST(COUNT(*) AS BIGINT) AS n
        | FROM events WHERE event_type IS NOT NULL
        | GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin.replaceAll("\n", " "),
    // Sliding windows replayed in SQL: every event belongs to the 4
    // epoch-aligned 60-minute windows whose 15-minute-grid start is in
    // (ts - 60min, ts]; start = floor(ts/slide)*slide - k*slide for
    // k in 0..3 enumerates exactly those.
    "x_sliding_window" ->
      """WITH t AS (SELECT epoch_ms(ts) AS ts_ms FROM events),
        | w AS (SELECT ((ts_ms // 900000) - k.k) * 900000 AS start_ms
        |   FROM t, (SELECT unnest(generate_series(0, 3)) AS k) k)
        | SELECT start_ms, CAST(COUNT(*) AS BIGINT) AS n_events
        | FROM w GROUP BY start_ms ORDER BY start_ms""".stripMargin.replaceAll("\n", " "),
    // Same lag+cumsum SQL twin as x_batch_sessions, with the native
    // operator's end convention (last event + gap, ms).
    "x_session_window" ->
      """WITH t AS (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
        | s AS (SELECT user_id, ts_ms,
        |   CASE WHEN lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms) IS NULL
        |     OR ts_ms - lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms) > 3600000
        |   THEN 1 ELSE 0 END AS ns FROM t),
        | g AS (SELECT user_id, ts_ms,
        |   SUM(ns) OVER (PARTITION BY user_id ORDER BY ts_ms ROWS UNBOUNDED PRECEDING) AS sid FROM s)
        | SELECT user_id, MIN(ts_ms) AS start_ms, MAX(ts_ms) + 3600000 AS end_ms,
        |   CAST(COUNT(*) AS BIGINT) AS n_events
        | FROM g GROUP BY user_id, sid ORDER BY user_id, start_ms""".stripMargin.replaceAll("\n", " "),
    "x_batch_sessions" ->
      """WITH t AS (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
        | s AS (SELECT user_id, ts_ms,
        |   CASE WHEN lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms) IS NULL
        |     OR ts_ms - lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms) > 3600000
        |   THEN 1 ELSE 0 END AS ns FROM t),
        | g AS (SELECT user_id, ts_ms,
        |   SUM(ns) OVER (PARTITION BY user_id ORDER BY ts_ms ROWS UNBOUNDED PRECEDING) AS sid FROM s)
        | SELECT user_id, MIN(ts_ms) AS start_ms, MAX(ts_ms) AS end_ms,
        |   CAST(COUNT(*) AS BIGINT) AS n_events
        | FROM g GROUP BY user_id, sid ORDER BY user_id, start_ms""".stripMargin.replaceAll("\n", " ")
  )
}
