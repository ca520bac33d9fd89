package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.sources.Tables

/** §2.7 streaming: the hourly rollup is ONE transform applied to either a
  * batch or a streaming DataFrame — batch/stream parity is by construction,
  * and `stream_hourly`'s oracle verifies the shared plan in batch mode.
  * Specs run the same transform through a real `readStream` with
  * `Trigger.AvailableNow` and a watermark, plus a stateful sessionizer via
  * `flatMapGroupsWithState`.
  */
object EventStream {

  /** Tumbling 1-hour window counts per event_type — works on batch and
    * streaming inputs alike (`window()` is supported in both).
    */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("hour_s"),
        col("n"))

  // --- stream_hourly (batch-parity verification entry) --------------------
  def streamHourly(spark: SparkSession, d: String): DataFrame =
    hourlyRollup(Tables.events(spark, d)).orderBy("event_type", "hour_s")

  val streamHourlySql: String =
    """SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour_s,
      | count(*) AS n
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Streaming variant of the same rollup: file-source stream with a 2-hour
    * watermark. Used by the availableNow spec; identical aggregation plan.
    */
  def hourlyRollupStream(stream: DataFrame): DataFrame =
    hourlyRollup(stream.withWatermark("ts", "2 hours"))

  /** Read the events table as a file-source stream (for specs: point it at
    * a directory of parquet files; availableNow drains it and stops). The
    * parquet stores TIMESTAMP(NANOS), which Spark reads as a nanos long
    * (nanosAsLong) — declare it that way and convert to micros here, same
    * as the batch loader.
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  case class EventIn(user_id: Long, event_id: Long, ts: Timestamp)
  case class SessionOut(user_id: Long, n_events: Long, start: Timestamp, end: Timestamp)
  /** Open-session state carried across micro-batches (public: the state
    * encoder's generated code must see the constructor).
    */
  case class SessionState(n: Long, start: Long, last: Long)

  /** Stateful sessionization (gap > 30 min closes a session) via
    * `flatMapGroupsWithState` with a processing-time timeout.
    *
    * Only CLOSED sessions are emitted; the open session survives in
    * `GroupState` across micro-batches (so a session spanning two batches
    * is one session, not two) and is flushed when the user goes idle past
    * the gap (timeout fires) — the behavior a production job needs.
    * Bounded replays (availableNow) therefore end with each user's last
    * session still open in state; specs compare against the batch
    * sessionizer minus those trailing sessions.
    */
  def sessionize(spark: SparkSession, events: Dataset[EventIn]): Dataset[SessionOut] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout()) {
        (userId: Long, rows: Iterator[EventIn], state: GroupState[SessionState]) =>
          def close(st: SessionState) =
            SessionOut(userId, st.n, new Timestamp(st.start * 1000), new Timestamp(st.last * 1000))
          if (state.hasTimedOut) {
            // user idle past the gap: flush the open session
            val out = state.getOption.map(close).iterator
            state.remove()
            out
          } else {
            // Sort within the per-batch group; a production job would rely
            // on watermarked event-time ordering instead.
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
            var st = state.getOption.getOrElse(SessionState(0, 0, Long.MinValue))
            sorted.foreach { e =>
              val t = e.ts.getTime / 1000
              if (st.n == 0) st = SessionState(1, t, t)
              else if (t - st.last > 1800) {
                out += close(st)
                st = SessionState(1, t, t)
              } else st = SessionState(st.n + 1, st.start, t)
            }
            if (st.n > 0) {
              state.update(st) // keep the open session across batches
              state.setTimeoutDuration("30 minutes")
            }
            out.iterator
          }
      }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_hourly" -> streamHourly)

  val oracle: Map[String, String] = Map(
    "stream_hourly" -> streamHourlySql)
}
