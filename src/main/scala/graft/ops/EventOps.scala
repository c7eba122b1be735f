package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream operators over `events(event_id, ts TIMESTAMP, user_id,
  * event_type, value, props)`. Batch formulations here; the structured-
  * streaming twins live in graft.streaming (same aggregation logic driven
  * by readStream + watermark).
  */
object EventOps {

  /** Tumbling-window aggregation per event type (window start as timestamp). */
  def windowedAgg(events: DataFrame): DataFrame =
    events.groupBy(
        window(col("ts"), "1 hour").getField("start").as("win_start"),
        col("event_type"))
      .agg(count("*").as("n_events"),
        round(sum("value"), 4).as("sum_value"),
        countDistinct("user_id").as("n_users"))

  /** Gap-based sessionization (new session when > 30 min since previous
    * event of the same user): classic lag + cumulative-sum-of-breaks. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val withBreak = events
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("prev_ts").cast("timestamp")) > gapMinutes * 60000000L, 1)
          .otherwise(0))
      .withColumn("session_seq", sum("is_new").over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
    withBreak.groupBy(col("user_id"), col("session_seq"))
      .agg(count("*").as("n_events"),
        min("ts").as("session_start"),
        max("ts").as("session_end"))
  }
}
