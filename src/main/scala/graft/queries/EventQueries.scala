package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stream-shaped analytics over the `events` table — the batch twins of the
  * Structured Streaming operators (graft.streaming.StreamOps runs the SAME
  * transform functions over readStream sources; StreamingSpec proves
  * batch/stream agreement on MemoryStream input).
  */
object EventQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")

  /** Tumbling-window counts per event type (the watermark+window agg of the
    * streaming path; date_trunc keys the window start).
    */
  val qWindowCounts = Q(
    "q50_window_counts",
    (s, dir) =>
      graft.streaming.StreamOps.windowedCountsWithUsers(events(s, dir)),
    Some("""SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2""".stripMargin))

  /** Sessionization: 30-minute-gap sessions per user via lag + running sum —
    * the batch twin of flatMapGroupsWithState session tracking.
    */
  val qSessionize = Q(
    "q51_sessionize",
    (s, dir) =>
      graft.streaming.StreamOps.sessionize(events(s, dir)),
    Some("""WITH g AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > 1800
        |           OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |),
        |se AS (
        |  SELECT user_id, event_id,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_idx
        |  FROM g
        |)
        |SELECT user_id, CAST(session_idx AS INT) AS session_idx,
        |  COUNT(*) AS n_events, MIN(event_id) AS first_event
        |FROM se GROUP BY user_id, session_idx""".stripMargin))

  /** Top-k event types per hour (rank window over an agg). */
  val qTopTypes = Q(
    "q52_top_types_per_hour",
    (s, dir) => {
      val counts = events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("window_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("window_start"))
        .orderBy(col("n").desc, col("event_type").asc)
      counts.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 2)
        .select(col("window_start"), col("event_type"), col("n"), col("rnk"))
    },
    Some("""SELECT window_start, event_type, n, rnk FROM (
        |  SELECT date_trunc('hour', ts) AS window_start, event_type,
        |    COUNT(*) AS n,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
        |      ORDER BY COUNT(*) DESC, event_type ASC) AS INT) AS rnk
        |  FROM events GROUP BY 1, 2) t
        |WHERE rnk <= 2""".stripMargin))

  val all: Seq[Q] = Seq(qWindowCounts, qSessionize, qTopTypes)
}
