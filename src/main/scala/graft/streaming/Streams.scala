package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface. The reference is batch-only (SURVEY §2.9);
  * these are the streaming shapes a continuous ingest of the same pipeline
  * needs: watermarked tumbling-window aggregation, within-watermark dedup,
  * and stateful gap sessionization via flatMapGroupsWithState. Each transform
  * also runs on a batch DataFrame (minus watermark), which is how tests prove
  * stream/batch equivalence. */
object Streams {

  /** Tumbling-window counts/sums per event_type (watermark applies only under
    * readStream; on a batch frame it is a no-op column marker). */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour",
                  watermark: String = "2 hours"): DataFrame = {
    // event time must be TIMESTAMP (not NTZ) for watermarking; session TZ is UTC
    val tz = events.withColumn("ts", col("ts").cast("timestamp"))
    val src = if (tz.isStreaming) tz.withWatermark("ts", watermark) else tz
    src.groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"), col("total"))
  }

  /** Exactly-once-per-key dedup within the watermark horizon. */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val tz = events.withColumn("ts", col("ts").cast("timestamp"))
    val src = if (tz.isStreaming) tz.withWatermark("ts", watermark) else tz
    src.dropDuplicates("event_id")
  }

  case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Int)
  case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp, n_events: Int)

  /** Gap-based sessionization (30-min inactivity closes a session) with
    * explicit state — the custom-state streaming shape the engine exposes. */
  def sessionize(spark: SparkSession, events: Dataset[Event],
                 gapMs: Long = 30 * 60 * 1000L): Dataset[Session] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[List[SessionState]]) =>
          // batch-mode friendly: sort the group's events, emit closed sessions
          val times = it.map(_.ts.getTime).toArray.sorted
          if (times.isEmpty) Iterator.empty
          else {
            val sessions = scala.collection.mutable.ListBuffer.empty[Session]
            var start = times(0); var last = times(0); var n = 1
            var i = 1
            while (i < times.length) {
              if (times(i) - last > gapMs) {
                sessions += Session(user, new Timestamp(start), new Timestamp(last), n)
                start = times(i); n = 0
              }
              last = times(i); n += 1
              i += 1
            }
            sessions += Session(user, new Timestamp(start), new Timestamp(last), n)
            sessions.iterator
          }
      }
  }
}
