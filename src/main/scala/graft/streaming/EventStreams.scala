package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY §2.11).
  *
  * The reference is batch-only; this is the additive streaming facade the
  * survey prescribes: the same event-time logic as the batch operators
  * (graft.ops.Events / Aggregates.sessionize), expressed over an append
  * stream with watermarks. Batch/stream parity is asserted in specs — the
  * batch twin is the oracle.
  *
  * At scale: file/Kafka source → watermark bounds state; tumbling windows
  * and session windows are Spark's native stateful aggs; the custom
  * per-user state (flatMapGroupsWithState) is the hook the frame-EPPA
  * kernel would use for live tracking feeds (SURVEY §2.11's
  * "design the kernel to be reusable from flatMapGroupsWithState").
  */
object EventStreams {

  /** File-source stream over an events parquet (µs-truncated ts like
    * graft.Tables.events). */
  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema(graft.Tables.eventsRawSchema)
      .parquet(path)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))

  /** Tumbling 6-hour windows per event type with a 1-hour watermark. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(graft.ops.Num.micros(col("value"))).as("value_micros"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), (col("value_micros") / 1e6).as("total_value"))

  /** Session windows (30-minute gap) per user — the streaming twin of
    * graft.ops.Aggregates.sessionize. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           sum(graft.ops.Num.micros(col("value"))).as("value_micros"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"), (col("value_micros") / 1e6).as("session_value"))

  final case class UserState(nEvents: Long, totalMicros: Long)
  final case class UserUpdate(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state: running per-user totals via
    * flatMapGroupsWithState (§2.12 — the pattern that hosts the EPPA
    * kernel on a live feed). */
  def runningUserTotals(spark: SparkSession, events: DataFrame): Dataset[UserUpdate] = {
    import spark.implicits._
    events
      .select(col("user_id"), graft.ops.Num.micros(col("value")).as("micros"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Long)], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0L))
          var n = prev.nEvents
          var tot = prev.totalMicros
          rows.foreach { r => n += 1; tot += r._2 }
          state.update(UserState(n, tot))
          Iterator.single(UserUpdate(userId, n, tot / 1e6))
      }
  }

  /** Drain a streaming DataFrame through a memory sink synchronously
    * (local verification harness; production would writeStream to a real
    * sink with a trigger). */
  def drainToMemory(df: DataFrame, name: String,
                    mode: OutputMode = OutputMode.Append): DataFrame = {
    val q = df.writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }
}
