package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream analytics over the `events` table shape
  * (event_id, ts TIMESTAMP, user_id, event_type, value, props).
  *
  * Each operator has a BATCH form (pure Catalyst, DuckDB-oracle-checked
  * via the gate) and a STREAMING form (same semantics under Structured
  * Streaming: watermarked windowed aggregation; gap sessions via
  * flatMapGroupsWithState event-time state). StreamingSpec proves the
  * two forms agree on the same data — the unification Structured
  * Streaming exists for.
  *
  * Sums run in DECIMAL(18,2) (exact, order-independent) and convert to
  * double only in the output projection, so results are bit-identical
  * across engines and across batch/stream operator orderings.
  */
object Events {

  // ---- tumbling-window per-type counts --------------------------------

  /** Batch/streaming-agnostic transform: tumbling `windowLen` windows per
    * event_type -> (window_start epoch-seconds, event_type, n_events,
    * sum_value). */
  def windowedTypeCounts(events: DataFrame, windowLen: String): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("sv"))
      .select(
        unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"),
        col("n_events"),
        round(col("sv").cast("double"), 6).as("sum_value"))

  /** Streaming form: identical plan plus an event-time watermark so state
    * for closed windows is dropped. */
  def windowedTypeCountsStream(events: DataFrame, windowLen: String,
                               watermark: String): DataFrame =
    windowedTypeCounts(events.withWatermark("ts", watermark), windowLen)

  // ---- gap-based sessionization ---------------------------------------

  case class SessionRow(user_id: Long, session_start: Long,
                        n_events: Long, sum_value: Double)

  /** Batch sessionization: a session breaks when the gap to the previous
    * event of the same user exceeds `gapMinutes`. Implemented with a
    * per-user window (hash-partitioned by user_id — scales with users)
    * and exact microsecond arithmetic. */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    events
      // parquet event times may read as TIMESTAMP_NTZ; with the session
      // in UTC the cast is an exact reinterpretation
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("prev_us", lag("ts_us", 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum("new_sess")
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sess_id")
      .agg(min("ts_us").as("session_start_us"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("sv"))
      .select(col("user_id"),
        (col("session_start_us") / 1000000L).cast("long").as("session_start"),
        col("n_events"),
        round(col("sv").cast("double"), 6).as("sum_value"))
  }

  // not private: Catalyst codegen must be able to access the accessors
  case class SessState(startUs: Long, lastUs: Long, n: Long, sumCents: Long)

  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime / 1000 * 1000000L + ts.getNanos / 1000

  /** Streaming sessionization with event-time state: per-user open
    * session kept in GroupState, closed (emitted) when a new event
    * arrives past the gap or the event-time watermark times the state
    * out. Semantics identical to the batch `sessionize` on the same
    * data once every session has closed. */
  def sessionizeStream(events: DataFrame, gapMinutes: Int,
                       watermark: String): Dataset[SessionRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, evs: Iterator[(Long, java.sql.Timestamp, Long)],
         state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionRow(userId, s.startUs / 1000000L, s.n,
              s.sumCents / 100.0))
          } else {
            val sorted = evs.map { case (_, ts, c) => (micros(ts), c) }
              .toArray.sortBy(_._1)
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionRow]
            var cur = state.getOption
            sorted.foreach { case (tUs, cents) =>
              cur match {
                case Some(s) if tUs - s.lastUs <= gapUs =>
                  cur = Some(SessState(s.startUs, tUs, s.n + 1,
                    s.sumCents + cents))
                case Some(s) =>
                  closed += SessionRow(userId, s.startUs / 1000000L, s.n,
                    s.sumCents / 100.0)
                  cur = Some(SessState(tUs, tUs, 1L, cents))
                case None =>
                  cur = Some(SessState(tUs, tUs, 1L, cents))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // time the open session out `gap` past its last event;
              // clamped above the current watermark — Spark rejects a
              // timeout <= watermark, reachable when the watermark delay
              // exceeds the session gap (an admitted event's ts+gap can
              // already be past the global watermark)
              state.setTimeoutTimestamp(math.max(
                (s.lastUs + gapUs) / 1000L,
                state.getCurrentWatermarkMs() + 1L))
            }
            closed.iterator
          }
      }
  }
}
