package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Event-time streaming operators over an events stream
 * `(user_id LONG, event_type STRING, ts TIMESTAMP, value DOUBLE)` —
 * the streaming forms of the batch q_events_hourly / q_sessionize
 * queries. The reference itself is processing-time only (SURVEY §2.9);
 * these are engine extensions for real event streams at scale.
 */
object EventTimeOps {

  /**
   * Tumbling-window counts/sums with a watermark: late events beyond
   * `lateness` are dropped and state for closed windows is reclaimed —
   * the property that keeps state bounded on an unbounded stream.
   */
  def windowedCounts(events: DataFrame, windowLength: String = "1 hour",
      lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"), col("sum_value"))

  /**
   * Streaming exact dedup with bounded state: drop repeat `keyCols`
   * arrivals, keeping state only within the watermark horizon —
   * `dropDuplicatesWithinWatermark` reclaims each key's state once the
   * watermark passes it, so state is bounded by the lateness window
   * instead of growing with the whole stream. The streaming counterpart
   * of the batch `Dedup.exact*` operators (same key semantics) for
   * at-least-once sources that can redeliver.
   */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
      lateness: String = "30 minutes", tsCol: String = "ts"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols)

  /**
   * Stream-stream interval join: pair rows of two streams sharing
   * `key` whose event times lie within `within` of each other. Both
   * sides carry watermarks AND the join condition bounds each side's
   * event time by the other's — the two ingredients Spark needs to
   * reclaim join state (without the time bound the left buffer would
   * grow forever waiting for arbitrarily-late right matches).
   *
   * `joinType` "inner" (default), "left_outer", "right_outer" or
   * "full_outer": outer forms emit an unmatched row (null columns for
   * the absent side) once the watermark passes the end of that row's
   * match interval — i.e. outer results are delayed by `within` +
   * `lateness`, the price of a correct "no match ever arrived" verdict
   * on an unbounded stream. Same state bound as inner: rows are
   * reclaimed at the watermark either way.
   *
   * Output columns: key (coalesced across sides for right/full outer,
   * so it is never null), left time/payload prefixed `l_`, right
   * prefixed `r_`.
   */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      tsCol: String, valueCol: String,
      within: String = "10 minutes",
      lateness: String = "30 minutes",
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_outer", "right_outer", "full_outer")(joinType),
      s"intervalJoin supports inner/left_outer/right_outer/full_outer, got '$joinType'")
    val l = left.select(col(key), col(tsCol).as("l_ts"), col(valueCol).as("l_value"))
      .withWatermark("l_ts", lateness)
    val r = right.select(col(key).as("__rk"), col(tsCol).as("r_ts"), col(valueCol).as("r_value"))
      .withWatermark("r_ts", lateness)
    val joined = l.join(r,
      col(key) === col("__rk") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $within") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $within"),
      joinType)
    val keyed =
      if (joinType == "right_outer" || joinType == "full_outer")
        joined.withColumn(key, coalesce(col(key), col("__rk")))
      else joined
    keyed.drop("__rk")
  }

  final case class SessionEvent(user_id: Long, ts_us: Long, value: Double)
  final case class SessionState(start_us: Long, last_us: Long, n: Long, sum: Double)
  final case class SessionOut(user_id: Long, s_start: Long, s_end: Long,
      n_events: Long, sum_value: Double)

  /**
   * Stateful sessionization via flatMapGroupsWithState: a session
   * closes after `gapUs` of event-time inactivity — either merged shut
   * by a later in-batch event, or reclaimed by an EVENT-TIME timeout
   * once the watermark passes `last + gap` — then emits one summary
   * row. Per-user state is one SessionState, bounded regardless of
   * stream length; the close decision depends only on event times, so
   * a replay of the same stream emits identical sessions (a
   * processing-time timeout would close sessions on wall-clock luck —
   * and kept the query alive waiting for wall-clock timeouts, so
   * `Trigger.AvailableNow` runs never self-terminated).
   *
   * `lateness` is the watermark delay on the event-time column: events
   * later than that are DROPPED before they reach the session state —
   * pass "0 seconds" only if the source guarantees event-time order
   * across micro-batches, because with a zero watermark any
   * out-of-order arrival in a later batch is silently discarded. The
   * default is the same 30-minute horizon the other operators here
   * use. State for users idle past `lateness + gap` is reclaimed.
   * Sessions still open when the stream ends (beyond the final
   * watermark) remain unemitted, exactly like an unclosed window in
   * [[windowedCounts]].
   */
  def sessionize(events: Dataset[SessionEvent], gapUs: Long,
      lateness: String = "30 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withColumn("__ts", timestamp_micros(col("ts_us")))
      .withWatermark("__ts", lateness)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.start_us, s.last_us, s.n, s.sum))
          } else {
            // No cross-batch ordering guarantee: an event may precede
            // the open session. Merge anything within `gapUs` of the
            // session's [start, last] span (extending either end); an
            // event older than start-gap belongs to an already-closed
            // window and is emitted as its own singleton session (late
            // data preserved, never an inverted span).
            val sorted = rows.toSeq.sortBy(_.ts_us)
            var cur = state.getOption
            val closed = scala.collection.mutable.ListBuffer.empty[SessionOut]
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.ts_us >= s.start_us - gapUs && e.ts_us <= s.last_us + gapUs =>
                  cur = Some(SessionState(math.min(s.start_us, e.ts_us),
                    math.max(s.last_us, e.ts_us), s.n + 1, s.sum + e.value))
                case Some(s) if e.ts_us > s.last_us + gapUs =>
                  closed += SessionOut(userId, s.start_us, s.last_us, s.n, s.sum)
                  cur = Some(SessionState(e.ts_us, e.ts_us, 1L, e.value))
                case Some(_) => // too old for the open session
                  closed += SessionOut(userId, e.ts_us, e.ts_us, 1L, e.value)
                case None =>
                  cur = Some(SessionState(e.ts_us, e.ts_us, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close when the watermark passes last + gap; clamp above
              // the current watermark (an already-overdue session closes
              // at the next watermark advance — Spark rejects timeouts
              // at or before the current watermark)
              state.setTimeoutTimestamp(math.max((s.last_us + gapUs) / 1000L,
                state.getCurrentWatermarkMs + 1L))
            }
            closed.iterator
          }
      }
  }
}
