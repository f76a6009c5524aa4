package graft

import graft.pipelines.IncrementalRollup
import org.apache.spark.sql.functions._

class IncrementalRollupSpec extends SparkTestBase {

  test("incremental ingest equals the full recompute, days untouched on disk") {
    val out = java.nio.file.Files.createTempDirectory("rollup").toString
    val ev = Tables.events(spark, sfDir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    val days = ev.select("day").distinct().orderBy("day")
      .collect().map(_.getString(0))
    assert(days.length >= 3, "need several days of events")
    val newDays = days.takeRight(2).toSet
    val past = ev.filter(!col("day").isin(newDays.toSeq: _*)).drop("day")
    val batch = ev.filter(col("day").isin(newDays.toSeq: _*)).drop("day")

    IncrementalRollup.initialize(past, out)
    def filesOf(day: String): Map[String, Long] = {
      val d = new java.io.File(s"$out/day=$day")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val oldDay = days.head
    val before = filesOf(oldDay)

    IncrementalRollup.ingest(ev.drop("day"), batch, out)

    // equality with the one-shot full rollup, bit for bit
    val got = IncrementalRollup.read(spark, out)
      .select("day", "event_type", "n_events", "total_value", "n_users")
      .collect().map(_.toSeq).toSet
    val full = IncrementalRollup.rollup(ev.drop("day"))
      .collect().map(_.toSeq).toSet
    assert(got == full)
    // a day outside the batch kept its exact files
    assert(filesOf(oldDay) == before, "untouched day was rewritten")
    // idempotent re-ingest of the same batch
    IncrementalRollup.ingest(ev.drop("day"), batch, out)
    assert(IncrementalRollup.read(spark, out)
      .select("day", "event_type", "n_events", "total_value", "n_users")
      .collect().map(_.toSeq).toSet == full)
  }
}
