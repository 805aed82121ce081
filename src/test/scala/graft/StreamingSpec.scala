package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Streams

/** Structured Streaming surface: the same transforms run as a stream (memory
  * sink, parquet source) and as a batch frame — results must agree. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val batchEvents = graft.core.Tables(spark, dir, "events")

  /** FileStreamSource needs a directory; stage the single parquet file. */
  private lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("windowed aggregation: streaming result equals batch result") {
    val schema = batchEvents.schema
    val stream = spark.readStream.schema(schema).parquet(streamDir)
    val q = Streams.windowedAgg(stream).writeStream
      .outputMode("append")
      .format("memory").queryName("win_agg")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    // double sums are order-sensitive across partitionings: compare rounded
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"bucket", $"event_type", $"n", round($"total", 6).as("total"))
    val streamed = canon(spark.table("win_agg"))
    val batch = canon(Streams.windowedAgg(batchEvents))
    assert(streamed.count() > 0)
    // every emitted window matches batch exactly
    assert(streamed.exceptAll(batch).count() == 0)
    // append mode withholds windows still inside the watermark horizon:
    // anything batch-only must sit within (watermark + window) of max ts
    val maxTs = batchEvents.agg(max($"ts".cast("timestamp"))).collect()(0).getTimestamp(0)
    val cutoff = new java.sql.Timestamp(maxTs.getTime - (2 + 1) * 3600 * 1000L)
    val missingEarly = batch.exceptAll(streamed).where($"bucket" < cutoff)
    assert(missingEarly.count() == 0)
  }

  test("dedup within watermark: stream drops duplicate event ids") {
    val schema = batchEvents.schema
    val stream = spark.readStream.schema(schema).parquet(streamDir)
    val doubled = stream.union(stream) // duplicate every event
    val q = Streams.dedupWithinWatermark(doubled).writeStream
      .outputMode("append")
      .format("memory").queryName("dedup_stream")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("dedup_stream").count() == batchEvents.count())
  }

  test("stateful sessionization groups events by 30-min gaps") {
    val events = batchEvents.as[Streams.Event]
    val sessions = Streams.sessionize(spark, events).cache()
    // every user's events are covered, session bounds ordered
    assert(sessions.where($"session_end" < $"session_start").count() == 0)
    val eventsPerUser = batchEvents.groupBy("user_id").count()
    val sessionEventsPerUser = sessions.groupBy("user_id")
      .agg(sum("n_events").as("n"))
    val mismatch = eventsPerUser.join(sessionEventsPerUser, "user_id")
      .where($"count" =!= $"n")
    assert(mismatch.count() == 0)
    // matches the SQL-window sessionization used in q31
    val q31 = graft.Queries.q31_sessionize(spark, dir)
    val fromState = sessions.groupBy("user_id").count()
      .groupBy("count").agg(count(lit(1)).as("n_users"))
      .select($"count".as("n_sessions"), $"n_users")
    assert(q31.exceptAll(fromState).count() == 0)
    assert(fromState.exceptAll(q31).count() == 0)
  }
}
