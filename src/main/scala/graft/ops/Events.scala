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

  /** One partition-local session in the two-phase form below: [startUs,
    * endUs], event count, exact cents sum, the count of NON-NULL values
    * (so an all-null session can emit a NULL sum like `sessionize`'s
    * null-skipping decimal sum does), and whether it is the FIRST or
    * LAST session of its user within its partition (only those can
    * merge across a partition boundary). Not private: Catalyst codegen
    * must access the accessors. */
  case class LocalSession(user_id: Long, startUs: Long, endUs: Long,
                          n: Long, sumCents: Long, nVals: Long,
                          boundary: Boolean)

  /** Skew-proof sessionization — identical output to `sessionize`, built
    * for the user the per-user window form cannot absorb: a Window
    * partitioned by user_id funnels EVERY event of one user through one
    * task, so a pathological account (a bot with 10^8 events) serializes
    * the stage. Here the (user_id, ts) timeline is RANGE-partitioned —
    * one user spreads over as many partitions as their volume needs —
    * each partition sessionizes its slice in one ordered pass, and only
    * the per-(partition, user) FIRST/LAST sessions (≤ 2 rows per user
    * per partition, data-size-independent) go through a second chain
    * merge keyed by user. Interior sessions cannot cross a boundary by
    * construction (range partitioning keeps each user's slice
    * time-contiguous), so they are emitted directly.
    *
    * Exactness: event times in microseconds, sums in exact cents
    * (decimal(18,2)·100 → long), the same strict-gap rule as
    * `sessionize` — SkewSpec asserts row-identical output on shared
    * fixtures including chains spanning every partition. */
  def sessionizePartitioned(events: DataFrame, gapMinutes: Int,
                            partitions: Int = 0): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val nPart = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val timeline = events
      .select(col("user_id").cast("long").as("u"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        coalesce((col("value").cast("decimal(18,2)") * 100).cast("long"),
          lit(0L)).as("cents"),
        // non-null marker: sessionize's decimal sum SKIPS nulls and
        // yields NULL for an all-null session — the cents sum must
        // distinguish "all null" (NULL) from "sums to zero" (0.0)
        when(col("value").isNotNull, 1L).otherwise(0L).as("has_v"))
      .repartitionByRange(nPart, col("u"), col("ts_us"))
      .sortWithinPartitions(col("u"), col("ts_us"))
      .as[(Long, Long, Long, Long)]
    val local: Dataset[LocalSession] = timeline.mapPartitions { it =>
      val out = scala.collection.mutable.ArrayBuffer.empty[LocalSession]
      // first session index per user, to mark boundaries after the scan
      val firstIdx = scala.collection.mutable.HashMap.empty[Long, Int]
      val lastIdx = scala.collection.mutable.HashMap.empty[Long, Int]
      var curU = Long.MinValue
      var open = false
      var s0 = 0L; var s1 = 0L; var n = 0L; var cents = 0L; var nv = 0L
      def close(): Unit = if (open) {
        val idx = out.length
        out += LocalSession(curU, s0, s1, n, cents, nv, boundary = false)
        if (!firstIdx.contains(curU)) firstIdx(curU) = idx
        lastIdx(curU) = idx
        open = false
      }
      it.foreach { case (u, tUs, c, v) =>
        if (u != curU) { close(); curU = u }
        else if (open && tUs - s1 > gapUs) close()
        if (!open) { open = true; s0 = tUs; s1 = tUs; n = 1L; cents = c; nv = v }
        else { s1 = tUs; n += 1L; cents += c; nv += v }
      }
      close()
      firstIdx.valuesIterator.foreach { i =>
        out(i) = out(i).copy(boundary = true)
      }
      lastIdx.valuesIterator.foreach { i =>
        out(i) = out(i).copy(boundary = true)
      }
      out.iterator
    }
    val interior = local.filter(!_.boundary)
    // chain merge of boundary sessions: per user ≤ 2 rows per partition,
    // sorted by start (slices are time-disjoint across partitions), so
    // one linear fold reconstructs every cross-boundary session
    val mergedBoundary = local.filter(_.boundary)
      .groupByKey(_.user_id)
      .flatMapGroups { (u: Long, it: Iterator[LocalSession]) =>
        val ss = it.toArray.sortBy(s => (s.startUs, s.endUs))
        val out = scala.collection.mutable.ArrayBuffer.empty[LocalSession]
        var cur = ss(0)
        var i = 1
        while (i < ss.length) {
          val nx = ss(i)
          if (nx.startUs - cur.endUs <= gapUs)
            cur = LocalSession(u, cur.startUs, math.max(cur.endUs, nx.endUs),
              cur.n + nx.n, cur.sumCents + nx.sumCents,
              cur.nVals + nx.nVals, boundary = true)
          else { out += cur; cur = nx }
          i += 1
        }
        out += cur
        out.iterator
      }
    interior.unionByName(mergedBoundary)
      .select(col("user_id"),
        (col("startUs") / 1000000L).cast("long").as("session_start"),
        col("n").as("n_events"),
        // all-null session -> NULL, matching sessionize's null-skipping
        // decimal sum (the documented identical-output contract)
        when(col("nVals") === 0L, lit(null).cast("double"))
          .otherwise(round((col("sumCents") / 100.0).cast("double"), 6))
          .as("sum_value"))
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
