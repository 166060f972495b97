package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming feature maintenance — the Structured Streaming analog of
  * the reference's event-stream → online-store path (streamer/,
  * provider online stores): a feature's latest value per entity kept as
  * typed keyed state, plus watermarked windowed aggregates.
  *
  * Batch/stream parity: `latestValueBatch` computes the same result as
  * draining `latestValueStream`, so the Verify oracle for the batch
  * analog is also the semantic spec of the stream.
  */
object StreamingFeatures {

  final case class FeatureEvent(entity: Long, value: Double, ts: Timestamp, event_id: Long)
  final case class LatestValue(entity: Long, value: Double, ts: Timestamp)

  /** Streaming latest-value per entity via typed keyed state. Emits the
    * updated latest row for each entity touched in a micro-batch.
    * State is O(1) per entity (just the current winner).
    */
  def latestValueStream(events: Dataset[FeatureEvent]): Dataset[LatestValue] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.entity)
      .mapGroupsWithState[LatestValue, LatestValue](GroupStateTimeout.NoTimeout) {
        (entity, rows, state: GroupState[LatestValue]) =>
          val incoming = rows.maxBy(e => (e.ts.getTime, e.event_id))
          val best = state.getOption match {
            case Some(cur) if cur.ts.after(incoming.ts) => cur
            case _ => LatestValue(entity, incoming.value, incoming.ts)
          }
          state.update(best)
          best
      }
  }

  /** Batch analog with identical semantics (same as
    * FeatureStore.materializeLatest but typed).
    */
  def latestValueBatch(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id").as("entity"))
      .agg(max_by(struct(col("value"), col("ts")), struct(col("ts"), col("event_id"))).as("l"))
      .select(col("entity"), col("l.value").as("value"), col("l.ts").as("ts"))

  /** A label or feature observation on the shared entity timeline. */
  final case class TaggedEvent(
      entity: Long, ts: Timestamp, event_id: Long, is_label: Boolean, value: Double)
  final case class EnrichedLabel(
      entity: Long, label_ts: Timestamp, label: Double, feature: Option[Double])

  /** Streaming point-in-time training set: each label row is emitted
    * enriched with the latest feature value whose ts <= label.ts —
    * the streaming counterpart of FeatureStore.trainingSet for a
    * single feature. Within a micro-batch, events are applied in
    * event-time order (ts, then feature-before-label, then event_id),
    * so a feature and label with equal ts resolve inclusively, exactly
    * like the batch as-of join. State per entity is O(1): the current
    * (value, ts) winner; monotonically-late feature arrivals that are
    * older than the state are ignored (they can no longer win any
    * future as-of).
    */
  def streamingTrainingSet(events: Dataset[TaggedEvent]): Dataset[EnrichedLabel] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.entity)
      .flatMapGroupsWithState[LatestValue, EnrichedLabel](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) { (entity, rows, state) =>
        val ordered = rows.toSeq.sortBy(e => (e.ts.getTime, e.is_label, e.event_id))
        val out = scala.collection.mutable.ListBuffer.empty[EnrichedLabel]
        var cur = state.getOption
        ordered.foreach { e =>
          if (e.is_label) {
            out += EnrichedLabel(entity, e.ts, e.value, cur.map(_.value))
          } else if (cur.forall(c => !c.ts.after(e.ts))) {
            cur = Some(LatestValue(entity, e.value, e.ts))
          }
        }
        cur.foreach(state.update)
        out.iterator
      }
  }

  final case class SessionEvent(user_id: Long, ts: Timestamp, event_id: Long)
  final case class SessionAcc(start: Long, last: Long, n: Long)
  final case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp, n_events: Long)

  /** Streaming sessionization with custom keyed state: a user's session
    * closes `gapMinutes` after their last event, enforced by an
    * event-time timeout against the watermark. Sessions are emitted
    * exactly once, on close (mid-batch gap crossings emit immediately;
    * the open tail emits when the watermark passes last + gap).
    * State per user is O(1) — (start, last, count).
    */
  def sessionizeStream(
      events: Dataset[SessionEvent], gapMinutes: Int): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes.toLong * 60000L
    def toSession(uid: Long, a: SessionAcc): Session =
      Session(uid, new Timestamp(a.start), new Timestamp(a.last), a.n)
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, Session](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) { (uid, rows, state) =>
        if (state.hasTimedOut) {
          val done = state.get
          state.remove()
          Iterator.single(toSession(uid, done))
        } else {
          val evs = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var acc = state.getOption
          val completed = scala.collection.mutable.ListBuffer.empty[Session]
          evs.foreach { e =>
            val t = e.ts.getTime
            acc match {
              case Some(a) if t - a.last > gapMs =>
                completed += toSession(uid, a)
                acc = Some(SessionAcc(t, t, 1))
              case Some(a) =>
                acc = Some(SessionAcc(a.start, math.max(a.last, t), a.n + 1))
              case None =>
                acc = Some(SessionAcc(t, t, 1))
            }
          }
          acc.foreach { a =>
            state.update(a)
            state.setTimeoutTimestamp(a.last + gapMs)
          }
          completed.iterator
        }
      }
  }

  /** Watermarked tumbling-window counts per event type (streaming). */
  def windowedCountsStream(events: DataFrame, watermark: String, windowLen: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("win_start"),
        col("event_type"),
        col("n"),
        col("sum_value"))

  /** Batch analog of the tumbling window (hour buckets). */
  def windowedCountsBatch(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(
        unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"),
        col("n"),
        col("sum_value"))
}
