package graft.streaming

import graft.SparkTestBase
import graft.nfl.{EppaJob, Normalize, ToyData}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Kernel-on-a-stream parity: the flatMapGroupsWithState facade must
  * produce the same per-frame PassSummary rows as the batch EppaJob on
  * the same tracking data (true-pass fields excluded — they need the
  * future by design). */
class EppaStreamSpec extends SparkTestBase {

  private lazy val norm = Normalize(ToyData.tracking(spark),
    ToyData.games(spark), ToyData.plays(spark)).cache()

  private lazy val trackRows: Seq[EppaStream.TrackRow] = {
    val spark2 = spark
    import spark2.implicits._
    norm.select(
      col("gameId"), col("playId"), col("frameId"),
      coalesce(col("event"), lit("")).as("event"),
      col("nflId"), col("displayName"),
      col("team_pos").as("teamPos"), col("position"),
      col("x"), col("y"),
      coalesce(col("v_x"), lit(0.0)).as("vX"),
      coalesce(col("v_y"), lit(0.0)).as("vY"),
      coalesce(col("a_x"), lit(0.0)).as("aX"),
      coalesce(col("a_y"), lit(0.0)).as("aY"))
      .as[EppaStream.TrackRow]
      .collect()
      // in-order delivery within a play (the contract a per-play
      // partitioned topic provides)
      .sortBy(r => (r.gameId, r.playId, r.frameId, r.nflId))
      .toSeq
  }

  private val epaTables = Seq((1L, 100L), (1L, 200L), (2L, 100L), (2L, 300L))
    .map(k => k -> (Array.tabulate(120)(i => i / 60.0), -0.5)).toMap

  test("streamed kernel matches batch EppaJob frame for frame") {
    val spark2 = spark
    import spark2.implicits._

    implicit val sqlCtx = spark2.sqlContext
    val mem = MemoryStream[EppaStream.TrackRow]
    val out = EppaStream.passSummaries(mem.toDS(), epaTables)
    val q = out.toDF().writeStream.format("memory")
      .queryName("eppa_stream").outputMode("append").start()
    // three chunks: mid-play split exercises cross-batch state
    val chunks = trackRows.grouped(math.max(1, trackRows.size / 3)).toSeq
    chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
    q.stop()
    val streamed = spark2.table("eppa_stream")
      .select("gameId", "playId", "frameId", "eppa1Tot", "maxEppa1",
        "maxX", "maxY", "maxT")
      .as[(Long, Long, Int, Double, Double, Double, Double, Double)]
      .collect().map(r => (r._1, r._2, r._3) -> r).toMap

    val batch = EppaJob.run(EppaJob.frameInputs(norm), epaTables)
      .collect().map(_.pass)
      .map(p => (p.gameId, p.playId, p.frameId) -> p).toMap

    assert(streamed.nonEmpty, "stream emitted no frames")
    // every streamed frame must match its batch twin exactly
    streamed.foreach { case (k, s) =>
      val b = batch.getOrElse(k, fail(s"streamed frame $k not in batch"))
      assert(s._4 == b.eppa1Tot, s"$k eppa1Tot")
      assert(s._5 == b.maxEppa1, s"$k maxEppa1")
      assert((s._6, s._7, s._8) == ((b.maxX, b.maxY, b.maxT)), s"$k argmax")
    }
    // and the stream must have emitted every batch frame (pass_arrived
    // flushes the tail)
    val missing = batch.keySet -- streamed.keySet
    assert(missing.isEmpty, s"batch frames never streamed: $missing")
  }
}
