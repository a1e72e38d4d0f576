package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Transform functions shared by the batch queries (EventQueries) and the
  * Structured Streaming path (readStream → transform → writeStream).
  * Defining them once over DataFrame keeps batch/stream semantics provably
  * aligned — StreamingSpec runs them on a MemoryStream and asserts equality
  * with the batch result.
  */
object StreamOps {

  /** Tumbling 1h window counts per event type — streaming-safe (no exact
    * distinct; Structured Streaming forbids it). In streaming mode callers
    * prepend `.withWatermark("ts", "2 hours")`; date_trunc keys the window
    * start identically in both modes.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events.groupBy(date_trunc("hour", col("ts")).as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Batch-only variant adding an exact per-window user count (streaming
    * would need approx_count_distinct or a pre-dedup stage).
    */
  def windowedCountsWithUsers(events: DataFrame): DataFrame =
    events.groupBy(date_trunc("hour", col("ts")).as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"))

  /** 30-minute-gap sessionization per user (batch twin of
    * flatMapGroupsWithState session state).
    */
  def sessionize(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapped = events.select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
          .otherwise(0))
    gapped
      .withColumn("session_idx", sum(col("is_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"), min(col("event_id")).as("first_event"))
  }
}
