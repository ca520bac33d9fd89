package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventStream

class StreamingSpec extends SparkSpec {

  private def stageEventsDir(): String = {
    val dir = Files.createTempDirectory("graft-stream-").toString
    val src = Paths.get(s"$sf/events.parquet")
    Files.copy(src, Paths.get(dir, "events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  test("availableNow streaming hourly rollup equals the batch plan") {
    val dir = stageEventsDir()
    val stream = EventStream.eventsStream(spark, dir)
    val q = EventStream.hourlyRollup(stream)
      .writeStream.format("memory").queryName("hourly_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("hourly_stream")
      .select("event_type", "hour_s", "n")
    val batch = EventStream.streamHourly(spark, sf)
    assert(streamed.count() > 0)
    assert(streamed.except(batch).count() === 0)
    assert(batch.except(streamed).count() === 0)
  }

  test("stateful sessionization via flatMapGroupsWithState matches the window-based batch sessionizer") {
    import spark.implicits._
    val dir = stageEventsDir()
    val stream = EventStream.eventsStream(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"))
      .as[EventStream.EventIn]
    val q = EventStream.sessionize(spark, stream)
      .writeStream.format("memory").queryName("sessions_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("sessions_stream")
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
    val batch = graft.operators.Analytics.qSessionize(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
    assert(streamed.count() > 0)
    assert(streamed.except(batch).count() === 0)
    assert(batch.except(streamed).count() === 0)
  }
}
