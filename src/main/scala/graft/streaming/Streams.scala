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

  /** Streaming ingest of the linkage pipeline's front end (SURVEY §2.9
    * stretch): watermarked within-horizon URL dedup over the page stream,
    * then the SAME one-pass projection (normText/price/media pooling) and
    * MinHash+domain block-key derivation the batch pipeline uses — both are
    * pure per-row transforms, so the incrementally-appended block table is
    * IDENTICAL to the one-shot batch table over the same pages (pinned by
    * StreamingSpec). Downstream stages run in batch over the accumulated
    * snapshot ON SCHEDULE, and INCREMENTALLY: each scheduled run feeds the
    * new batch's page ids to `Blocking.deltaPairs`, which joins only the
    * new pages' block entries against the accumulated table — old×old
    * pairs are never regenerated or re-scored, and the union of per-batch
    * delta pairs equals the one-shot candidate set for every block that
    * never crosses maxBlock mid-stream (StreamingSpec "incremental
    * ingest"; crossing blocks follow monotone-emission semantics — see
    * Blocking.deltaPairs). On a batch frame this is exactly
    * projected → blockTable (watermark/dedup degrade to plain distinct). */
  def ingestBlockTable(pages: DataFrame,
                       cfg: graft.blocking.Blocking.Config = graft.blocking.Blocking.Config(),
                       watermark: String = "2 hours"): DataFrame = {
    val tz = pages.withColumn("warc_ts", col("warc_ts").cast("timestamp"))
    val deduped =
      if (tz.isStreaming)
        tz.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark("url")
      else tz.dropDuplicates("url")
    graft.blocking.Blocking.blockTableFromProjected(
      graft.scoring.Scoring.projected(deduped), cfg)
  }

  /** Scheduled incremental consumer for the STREAMING TWO-TABLE deployment
    * (round-5 VERDICT stretch): a stable (or slowly-growing) left catalog
    * linked against a right catalog that arrives as a stream. The streaming
    * front end is [[ingestBlockTable]] on the right-side page stream
    * (watermarked URL dedup → per-row projection → block entries — all
    * per-row, so the accumulated right block table is identical to the
    * one-shot batch table); each micro-batch's NEW block entries are appended
    * to the accumulated table (foreachBatch in deployment), and this
    * consumer turns one batch into its delta MATCHES:
    * [[graft.blocking.Blocking.deltaPairsTwoTable]] (old×old never
    * re-joined; maxBlock gated at accumulated per-side sizes) →
    * [[graft.scoring.Scoring.scoreTwoTable]] → threshold. Under Average
    * composition a page's attrs are corpus-independent, so per-batch match
    * emissions are FINAL — the union over batches equals the one-shot
    * two-table run on the final catalogs (StreamingSpec pins this with a
    * real file stream driving the right side). */
  def twoTableDeltaMatches(spark: SparkSession,
                           accumLeftBlocks: DataFrame, accumRightBlocks: DataFrame,
                           newIdsLeft: DataFrame, newIdsRight: DataFrame,
                           leftAttrs: Dataset[graft.core.ScoreAttrs],
                           rightAttrs: Dataset[graft.core.ScoreAttrs],
                           w: graft.scoring.Scoring.Weights = graft.scoring.Scoring.Weights(),
                           cfg: graft.blocking.Blocking.Config = graft.blocking.Blocking.Config(),
                           sizesLeft: Option[DataFrame] = None,
                           sizesRight: Option[DataFrame] = None): DataFrame = {
    // sizesLeft/sizesRight: incrementally-maintained per-side block-size
    // tables (Blocking.mergedBlockSizes, snapshot-carried in deployment) —
    // lets the over-cap gate skip re-aggregating the accumulated block
    // tables every scheduled batch
    val pairs = graft.blocking.Blocking.deltaPairsTwoTable(
      accumLeftBlocks, accumRightBlocks, newIdsLeft, newIdsRight, cfg,
      sizesLeft = sizesLeft, sizesRight = sizesRight)
    graft.scoring.Scoring.scoreTwoTable(spark, pairs, leftAttrs, rightAttrs, w)
      .toDF().where(col("score") >= w.threshold)
  }

  case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
  /** Open-session state; start/last are epoch MICROseconds (Timestamp.getTime
    * is millis and silently truncates the source's microsecond event times —
    * the batch/stream equivalence test pins this). */
  case class SessionState(start: Long, last: Long, n: Int)
  case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp, n_events: Int)

  private def toMicros(ts: Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
  private def toTimestamp(us: Long): Timestamp = {
    val ts = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    ts
  }

  /** Gap-based sessionization (30-min inactivity closes a session).
    *
    * Batch input: the native `session_window` aggregation (no custom state —
    * the idiomatic Spark form; session_end is the LAST EVENT time, not
    * last + gap, matching q31's SQL analog).
    *
    * Streaming input: flatMapGroupsWithState with REAL GroupState — open
    * sessions persist across micro-batches, new events (in any within-
    * watermark order) merge into them interval-wise, and a session is
    * emitted only once the event-time watermark passes its end + gap
    * (either on a later batch for the key or via EventTimeTimeout).
    * Sessions spanning micro-batches are therefore emitted exactly once,
    * never split. */
  def sessionize(spark: SparkSession, events: Dataset[Event],
                 gapMs: Long = 30 * 60 * 1000L,
                 watermark: String = "2 hours"): Dataset[Session] = {
    import spark.implicits._
    // event time must be TIMESTAMP (not NTZ) for watermarking
    val events0 = events.toDF().withColumn("ts", col("ts").cast("timestamp")).as[Event]
    if (!events.isStreaming) {
      events0.toDF()
        .groupBy(col("user_id"), session_window(col("ts"), s"$gapMs milliseconds").as("w"))
        .agg(count(lit(1)).cast("int").as("n_events"), max(col("ts")).as("session_end"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("session_end"), col("n_events"))
        .as[Session]
    } else {
      events0.withWatermark("ts", watermark)
        .groupByKey(_.user_id)
        .flatMapGroupsWithState[List[SessionState], Session](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
          (user: Long, it: Iterator[Event], state: GroupState[List[SessionState]]) =>
            val gapUs = gapMs * 1000L
            // merge open sessions with incoming events, interval-wise
            val existing = state.getOption.getOrElse(Nil)
            val incoming = it.map { e =>
              val us = toMicros(e.ts); SessionState(us, us, 1)
            }.toList
            val merged = (existing ++ incoming).sortBy(s => (s.start, s.last))
              .foldLeft(List.empty[SessionState]) { (acc, s) =>
                acc match {
                  case h :: t if s.start - h.last <= gapUs =>
                    SessionState(h.start, math.max(h.last, s.last), h.n + s.n) :: t
                  case _ => s :: acc
                }
              }.reverse
            // a session is closed once no within-watermark event can extend it
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val (closed, open) = merged.partition(_.last + gapUs < wmUs)
            if (open.isEmpty) state.remove()
            else {
              state.update(open)
              // wake up when the watermark passes the earliest possible close
              state.setTimeoutTimestamp(math.max(
                (open.map(_.last).min + gapUs) / 1000L,
                state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator.map(s =>
              Session(user, toTimestamp(s.start), toTimestamp(s.last), s.n))
        }
    }
  }
}
