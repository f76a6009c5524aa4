package graft.pipelines

import graft.sources.Store
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized rollup — the pattern that keeps
  * a 100 TB metrics table fresh without recomputing history: the daily
  * per-type rollup (same aggregation as `Events.dailyRollup`) lives as a
  * day-partitioned parquet table, and each ingest batch recomputes ONLY
  * the days it touches, swapped in atomically via
  * [[Store.upsertPartitions]] (per-day grain: the day is both the
  * aggregation key and the partition key, so "upsert" degenerates to
  * replace-whole-day — correct under late/duplicate re-delivery of a
  * day's events, since the day recomputes from its full event set).
  *
  * Invariant (IncrementalRollupSpec): initialize(past) then
  * ingest(batch) equals rollup(past ∪ batch) bit-for-bit, and days not
  * in the batch keep their exact files on disk.
  */
object IncrementalRollup {

  /** The maintained aggregation, over an arbitrary slice of events. */
  def rollup(events: DataFrame): DataFrame =
    events
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           graft.ops.Num.exactSum(col("value")).as("total_value"),
           countDistinct(col("user_id")).as("n_users"))

  /** Full build: one aggregation, day-partitioned layout. */
  def initialize(events: DataFrame, outPath: String): Unit =
    Store.writePartitioned(rollup(events), outPath, Seq("day"))

  /** Incremental maintenance: re-aggregate exactly the days present in
    * `batch` from `allEvents` (late data means a batch day may include
    * events that arrived earlier), then swap those day partitions. Cost
    * is proportional to the touched days' event volume — directory
    * pruning keeps every other day unread.
    *
    * `dedupKey`: drop duplicate deliveries by this column AFTER the
    * day filter — so a replay-prone source (the streaming sink's bronze
    * log) pays the dedup shuffle only over the touched days, never the
    * full history. */
  def ingest(allEvents: DataFrame, batch: DataFrame, outPath: String,
             dedupKey: Option[String] = None): Unit = {
    val touchedDays = batch
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day")).distinct()
    // If the event log carries a `day` column (the day-partitioned bronze
    // sink does), join the touched-day keys against it RAW — a join on
    // the physical partition column is what lets dynamic partition
    // pruning skip every untouched day's directory. Deriving day from ts
    // here would full-scan the log.
    val touched0 =
      if (allEvents.columns.contains("day")) {
        val dayType = allEvents.schema("day").dataType
        allEvents
          .join(broadcast(touchedDays.select(col("day").cast(dayType).as("day"))), "day")
          .drop("day")
      } else allEvents
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .join(broadcast(touchedDays), "day")
        .drop("day")
    val touched = dedupKey.fold(touched0)(k => touched0.dropDuplicates(k))
    Store.upsertPartitions(rollup(touched), outPath,
      keyCols = Seq("day", "event_type"), partitionCols = Seq("day"))
  }

  /** Partition-directory type inference turns `day=2024-01-10` into a
    * DATE column on read; normalize back to the rollup's string day. */
  def read(spark: SparkSession, outPath: String): DataFrame =
    spark.read.parquet(outPath)
      .withColumn("day", date_format(col("day").cast("date"), "yyyy-MM-dd"))
}
