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
