package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table.
  *
  * The reference is batch-only (each streaming job runs to completion
  * before the next step, /root/reference/runner.go:352-356); this module is
  * part of the engine's extension surface: the same event pipeline shapes
  * (windowed counts, sessionization) expressed as continuous queries. A
  * parquet directory stands in for the production source (Kafka/Kinesis at
  * scale — swap `readStream.parquet` for `readStream.format("kafka")`; the
  * transforms are source-agnostic).
  *
  * Scale posture: watermarks bound state (late data beyond 1 hour is
  * dropped rather than growing state forever); the stateful sessionizer
  * keys by user_id so state partitions shard horizontally across
  * executors; both are the standard shapes that survive 1000-executor
  * deployments.
  */
object EventStream {

  /** Physical schema of events.parquet under the nanos-as-long read
    * (see graft.Tables.events): `tsType` is LongType for a
    * TIMESTAMP(NANOS) file, TimestampNTZType for a TIMESTAMP_MICROS one.
    */
  def eventsRawSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming read of the events source with event-time column.
    * FileStreamSource monitors a *directory*; the testdata layout keeps one
    * file per table in a shared dir, so stage a per-table symlink dir (a
    * production deployment points this at the table's own landing dir).
    */
  def readEvents(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val streamDir = {
      val d = java.nio.file.Files.createTempDirectory("graft-events-stream")
      // parent registered first → child deleted first at exit (reverse
      // registration order), so the dir is empty when its turn comes
      d.toFile.deleteOnExit()
      val link = d.resolve("events.parquet")
      java.nio.file.Files.createSymbolicLink(
        link, java.nio.file.Paths.get(s"$dir/events.parquet"))
      link.toFile.deleteOnExit()
      d.toString
    }
    // FileStreamSource needs the schema up front; take the physical ts type
    // from the batch footer read and apply the same normalization
    // Tables.events does.
    val physical = physicalTsType(s, s"$dir/events.parquet")
    normalizeTs(s.readStream.schema(eventsRawSchema(physical)).parquet(streamDir), physical)
  }

  /** Physical ts type of an events parquet file under the nanos-as-long
    * read: LongType for a TIMESTAMP(NANOS) file, TimestampNTZ for
    * TIMESTAMP_MICROS (footer-only read; no data scan).
    */
  def physicalTsType(s: SparkSession, eventsFile: String): DataType = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(eventsFile).schema("ts").dataType
  }

  /** The graft.Tables.events ts normalization, applied to a raw read. */
  def normalizeTs(df: DataFrame, physical: DataType): DataFrame =
    if (physical == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df.withColumn("ts", col("ts").cast("timestamp"))

  /** Tumbling 1-hour windowed counts per event type with a 1-hour
    * watermark — the streaming form of queries.Relational.timeWindow
    * (same groupings, continuously maintained).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"))

  /** Streaming deduplication: drop re-deliveries by event_id with a
    * watermark bounding the dedup state (ids older than 1 hour of event
    * time are forgotten — at-least-once sources redeliver within that
    * horizon, and state stays O(events/hour), not O(stream lifetime)).
    * The streaming face of the llm.Dedup family.
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id", "ts")

  /** Stream-static join: enrich the event stream with a static dimension
    * (here: customer attributes keyed by user_id≡custkey). The static side
    * is a plain DataFrame — Spark broadcasts/rescans it per micro-batch;
    * no state, no watermark needed. The streaming face of the map-side
    * join (SURVEY.md §2B #24).
    */
  def enrichedEvents(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(
      org.apache.spark.sql.functions.broadcast(dim),
      events("user_id") === dim("c_custkey"),
      "left")

  case class Ev(user_id: Long, ts_us: Long)
  case class SessionState(lastTsUs: Long, sessions: Long)
  case class UserSessions(user_id: Long, n_sessions: Long)

  /** Stateful sessionization via flatMapGroupsWithState: per user, a >30
    * minute event-time gap opens a new session; emits the running session
    * count per trigger. State carries only (lastTs, count) — O(1) per key
    * no matter how long the stream runs.
    */
  def sessionCounts(events: Dataset[Ev]): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSessions](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          // within-trigger events are unordered; sort this batch by time
          val sorted = evs.toArray.sortBy(_.ts_us)
          if (sorted.isEmpty) Iterator.empty
          else {
            var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L))
            sorted.foreach { e =>
              val gap = e.ts_us - st.lastTsUs
              val newSession = st.lastTsUs == Long.MinValue || gap > 1800L * 1000000L
              st = SessionState(e.ts_us, if (newSession) st.sessions + 1 else st.sessions)
            }
            state.update(st)
            Iterator.single(UserSessions(uid, st.sessions))
          }
      }
  }

  /** Convenience: streaming sessionization straight from the source. */
  def sessionCountsStream(s: SparkSession, dir: String): Dataset[UserSessions] = {
    import s.implicits._
    sessionCounts(
      readEvents(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
        .as[Ev])
  }
}
