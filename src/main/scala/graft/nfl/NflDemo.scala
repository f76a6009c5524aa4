package graft.nfl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end drive of the NFL domain pipeline over the toy week:
  * normalize → movement stats → EPA table (stub EP scorer). Run with
  * `sbt "runMain graft.nfl.NflDemo"`. Doubles as living documentation of
  * the domain API surface.
  */
object NflDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val norm = Normalize(ToyData.tracking(spark), ToyData.games(spark),
      ToyData.plays(spark)).cache()
    println(s"NORM_ROWS=${norm.count()}")

    val top = MovementStats.topSpeedByPosition(norm, 3)
    println("TOP_SPEED:")
    top.show(10, false)

    val pre = Seq((1L, 100L, 1, 60.0, 10.0), (1L, 200L, 3, 40.0, 5.0))
      .toDF("gameId", "playId", "down_x", "yardline_100", "ydstogo")
    // 7-class EP GBDT (fixture ensemble; EpModel.load(path) for a real dump)
    val epa = EpaModel.epaTable(pre, EpModel.fixtureScorer)
    println(s"EPA_ROWS=${epa.count()}")
    epa.filter($"play_endpoint_x".isin(0.5, 60.5, 110.5)).orderBy("playId", "play_endpoint_x")
      .show(10, false)

    // frame-EPPA kernel over the toy plays (stub xyac + synthetic priors)
    val epaTables = Seq((1L, 100L), (1L, 200L), (2L, 100L), (2L, 300L))
      .map(k => k -> (Array.tabulate(120)(i => i / 60.0), -0.5)).toMap
    val inputs = EppaJob.frameInputs(norm)
    println(s"KERNEL_INPUT_FRAMES=${inputs.count()}")
    // priors fitted from this corpus's own observed passes (synthetic
    // fallback fills distances the 4 toy plays never threw)
    val obs = Priors.observedPasses(norm)
    println(s"OBSERVED_PASSES=${obs.count()}")
    val priors = Priors.fitFromTracking(norm)
    // real trained xyac GBDT when the reference checkout is present
    // (play_eppa_cpu.py:80,456-459); flat-yac stub otherwise
    val xyacModel = XyacModel.loadReferenceIfPresent()
    val xyac = xyacModel.map(XyacModel.kernelScorer)
      .getOrElse((_: Array[Double]) => 5.0)
    val xyacBatch = xyacModel.map(XyacModel.kernelBatchScorer).orNull
    println(s"XYAC_MODEL=${xyacModel.map(m => s"reference-${m.trees.length}-trees").getOrElse("stub")}")
    val t0 = System.nanoTime()
    val out = EppaJob.run(inputs, epaTables, priors = priors,
      xyacScore = xyac, xyacBatch = xyacBatch).cache()
    val passes = out.map(_.pass).toDF()
    println(s"KERNEL_FRAMES_DONE=${passes.count()} in ${(System.nanoTime() - t0) / 1e9}%s sec")
    passes.select("gameId", "playId", "frameId", "eppa1Tot", "maxEppa1",
      "maxX", "maxY", "maxT", "maxPpcOff", "trueX", "trueY", "trueT",
      "truePpcOff").show(6, false)

    // rankings over kernel outputs (§3.3)
    val summary = Rankings.playSummary(passes)
    val joined = Rankings.withPlayMeta(summary, ToyData.plays(spark))
    println(s"RANKINGS_PLAYS=${joined.count()}")
    Rankings.teamRanking(out.flatMap(_.players).toDF()).show(false)

    spark.stop()
  }
}
