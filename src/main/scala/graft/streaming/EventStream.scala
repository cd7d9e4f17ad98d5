package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming event analytics over the `events` stream shape
  * (`event_id, ts timestamp, user_id, event_type, value, props`) — the [EXT]
  * windowed-aggregation surface of SURVEY.md §2.10.
  *
  * Each transformation takes the (streaming or batch) events DataFrame and
  * returns a declarative plan — identical code path in both modes, like the
  * CDC fold. Watermarks bound state: with a 2-hour watermark, window state
  * for hours older than (max event time − 2h) is dropped, so state size is
  * O(active windows × groups), independent of stream length — the property
  * that keeps a 100 TB/day stream's state in memory.
  */
object EventStream {

  /** Declare the event-time watermark ONCE, at ingress. Stateful ops below
    * take an already-watermarked stream and never re-declare it — Spark
    * rejects watermark redefinition when stateful operators are chained
    * (e.g. dedup → windowed agg), so composability requires the watermark
    * to be the caller's single declaration.
    */
  def watermarked(events: DataFrame, delay: String = "2 hours"): DataFrame =
    events.withWatermark("ts", delay)

  /** Tumbling one-hour counts/sums per event type. In streaming-append
    * mode a window emits exactly once, when the watermark passes its end —
    * late events inside the watermark still land in their window; older
    * ones are dropped (bounded lateness, explicit and monitorable).
    * Input must be [[watermarked]] for append-mode streaming.
    */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** At-least-once delivery dedup by event id: keeps first arrival, drops
    * replays that arrive within the watermark horizon. State is bounded by
    * the watermark (ids older than the horizon are forgotten — a replay
    * later than that is indistinguishable from a new event, the standard
    * at-least-once contract). Input must be [[watermarked]].
    */
  def dedupByEventId(events: DataFrame): DataFrame =
    events.dropDuplicatesWithinWatermark(Seq("event_id"))

  /** Session-window aggregation: per-user sessions closed by `gap` of
    * inactivity, via the native `session_window` — Spark's merging window
    * state (sessions extend/merge as events arrive; a session emits in
    * append mode once the watermark passes its close). The relational
    * formulation of the same semantics is `q_events_sessionize`
    * (lag + cumulative flag), oracle-checked in batch; this is its
    * streaming-native form with state bounded by the watermark. Input
    * must be [[watermarked]].
    */
  def sessionsByUser(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Stream-stream interval join: each purchase paired with the same
    * user's view events from the preceding hour (view_ts ∈
    * [purchase_ts − 1h, purchase_ts]).
    *
    * Takes the RAW stream — each side declares its OWN watermark (the
    * two-watermark shape stream-stream joins require; do not pre-apply
    * [[watermarked]]). The watermarks plus the bounded time-range
    * condition let Spark GC both join buffers: a view older than
    * (watermark − 1h) can never match a future purchase and its state is
    * dropped, so state stays O(time window × arrival rate) on an
    * unbounded stream. Inner join: a pair emits as soon as both sides
    * have arrived. Batch mode runs the identical plan (watermarks are
    * no-ops), so the semantics are oracle-checkable offline — the as-of
    * variant of this attribution is `q_asof_join`.
    */
  def purchaseViewJoin(events: DataFrame, delay: String = "2 hours",
                       joinType: String = "inner"): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", delay)
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("view_user"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", delay)
    // joinType = "left_outer": an unmatched purchase emits with null view
    // columns, but only once the watermark proves no matching view can
    // still arrive (purchase_ts + 1h + delay) — the emission is correct
    // BY CONSTRUCTION late, the price of outer semantics on unbounded
    // streams. Inner pairs emit as soon as both sides arrive.
    purchases.join(views,
      col("user_id") === col("view_user") &&
        col("view_ts") >= col("purchase_ts") - expr("interval 1 hour") &&
        col("view_ts") <= col("purchase_ts"),
      joinType)
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("view_id"), col("view_ts"))
  }
}
