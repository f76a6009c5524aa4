package graft.nfl

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Synthetic reference-shaped tracking fixture (FIXTURES.md §A10): 2 games
  * × plays in both directions, 22 actors + ball, snap→throw→catch events,
  * ≥48 frames. Deterministic (fixed seed), hand-checkable kinematics:
  * every player moves on a straight line at constant speed.
  */
object ToyData {

  val FramesPerPlay = 60
  val SnapFrame = 5
  val ThrowFrame = 30
  val ArriveFrame = 45

  def tracking(spark: SparkSession): DataFrame = {
    val rows = for {
      (gameId, playId, dirLeft) <- Seq((1L, 100L, false), (1L, 200L, true),
                                       (2L, 100L, false), (2L, 300L, true))
      frame <- 1 to FramesPerPlay
      actor <- 0 to 22 // 0 = ball
    } yield {
      val t = frame * 0.1
      val isBall = actor == 0
      val speed = if (isBall) 0.0 else 2.0 + (actor % 5) * 1.5 // yd/s
      val angleDeg = (actor * 37) % 360 // motion direction, tracking convention
      val rad = math.toRadians(90.0 - angleDeg)
      val x0 = 30.0 + actor * 2.0
      val y0 = 5.0 + (actor % 11) * 4.0
      val x = math.min(115.0, math.max(1.0, x0 + speed * math.cos(rad) * t))
      val y = math.min(52.0, math.max(1.0, y0 + speed * math.sin(rad) * t))
      val event =
        if (frame == SnapFrame) "ball_snap"
        else if (frame == ThrowFrame) "pass_forward"
        else if (frame == ArriveFrame) "pass_arrived"
        else null
      val team = if (isBall) "football" else if (actor <= 11) "home" else "away"
      val position = if (isBall) null
        else Seq("QB", "WR", "WR", "TE", "RB", "T", "G", "C", "G", "T", "WR",
                 "CB", "CB", "S", "FS", "MLB", "OLB", "OLB", "DE", "DT", "DT", "DE")((actor - 1) % 22)
      Row("2018-09-01T00:00:00.000Z", x, y, speed, 0.0, speed * 0.1,
        angleDeg.toDouble, angleDeg.toDouble, event,
        if (isBall) null else 1000L + actor,
        if (isBall) "Football" else s"Player $actor",
        if (isBall) null else Integer.valueOf(actor),
        position, frame, team, gameId, playId,
        if (dirLeft) "left" else "right", null)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), Schemas.trackingRaw)
  }

  def games(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, Integer.valueOf(1), "HOM", "VIS"),
        Row(2L, Integer.valueOf(1), "AAA", "BBB"))),
      Schemas.games)

  def plays(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 100L, "HOM", 0.5, "C", null),
        Row(1L, 200L, "VIS", -0.3, "I", null),
        Row(2L, 100L, "AAA", 1.2, "C", null),
        Row(2L, 300L, "BBB", 0.0, "C", null))),
      Schemas.plays)
}
