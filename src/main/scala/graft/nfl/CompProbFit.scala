package graft.nfl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Completion-probability parameter fitting (M4, reference
  * `analysis/models/completion_probability_torch.py:219-566`): the
  * reference runs torch Adam over (tti_sigma, a_max, s_max, …); the
  * Spark-first rebuild is a grid search where ONE distributed job scores
  * every candidate parameter set — observations × params cross join (the
  * params side is a broadcast literal table), per-pair BCE terms, one
  * aggregation. No driver-side loop per candidate, no collect of
  * observations.
  *
  * The forward model is the kernel's F2/F3 physics: nearest defender's
  * time-to-intercept vs flight time through the tti-sigma logistic.
  */
object CompProbFit {

  final case class Candidate(id: Int, ttiSigma: Double, aMax: Double, sMax: Double)
  final case class FitResult(ttiSigma: Double, aMax: Double, sMax: Double,
                             bce: Double, n: Long)

  /** observations: (def_dist double, tof double, completed int 0/1).
    * Returns the BCE-minimizing candidate. Time-to-intercept uses the
    * kernel's F2 closed form with s0 = 0, per candidate parameter set. */
  def fit(observations: DataFrame, grid: Seq[Candidate]): FitResult = {
    val spark = observations.sparkSession
    import spark.implicits._
    val params = broadcast(grid.toDF())
    val d = col("def_dist")
    val tLt = col("sMax") / col("aMax")
    val dLt = col("sMax") * col("sMax") / (col("aMax") * 2.0)
    val tTot = when(d <= dLt, sqrt(d * 2.0 / col("aMax")))
      .otherwise(tLt + (d - dLt) / col("sMax"))
    val k = lit(math.Pi / math.sqrt(3.0)) / col("ttiSigma")
    // defender intercepts ⇒ incompletion: p_complete = 1 − σ(k(T − t_tot))
    val pInt = lit(1.0) / (exp(-k * (col("tof") - tTot)) + 1.0)
    val pComp = greatest(least(lit(1.0) - pInt, lit(1 - 1e-9)), lit(1e-9))
    val best = observations.crossJoin(params)
      .withColumn("bce_term",
        -(col("completed") * log(pComp) +
          (lit(1.0) - col("completed")) * log(lit(1.0) - pComp)))
      .groupBy("id", "ttiSigma", "aMax", "sMax")
      .agg(avg("bce_term").as("bce"), count(lit(1)).as("n"))
      .orderBy(col("bce"), col("id"))
      .head()
    FitResult(best.getAs[Double]("ttiSigma"), best.getAs[Double]("aMax"),
      best.getAs[Double]("sMax"), best.getAs[Double]("bce"), best.getAs[Long]("n"))
  }

  /** Derive the fit's observations from normalized tracking + play
    * outcomes (the reference assembles the same triple from tracking in
    * `completion_probability_torch.py:52-140`): per play with both throw
    * and arrival events, the nearest defender's distance to the ball's
    * landing spot at arrival, the flight time in seconds, and whether
    * the pass completed (plays.passResult == "C"). One window pass per
    * play, one aggregation — no driver loop. */
  def observationsFromTracking(norm: DataFrame, plays: DataFrame): DataFrame = {
    val wPlay = org.apache.spark.sql.expressions.Window
      .partitionBy("gameId", "playId")
    val annotated = norm
      .withColumn("throw_frame", min(when(
        col("event").isin("pass_forward", "pass_shovel"), col("frameId"))).over(wPlay))
      .withColumn("arrive_frame", min(when(
        col("event") === "pass_arrived", col("frameId"))).over(wPlay))
      .withColumn("ball_x", max(when(
        col("nflId") === 0 && col("event") === "pass_arrived", col("x"))).over(wPlay))
      .withColumn("ball_y", max(when(
        col("nflId") === 0 && col("event") === "pass_arrived", col("y"))).over(wPlay))
      .filter(col("throw_frame").isNotNull && col("arrive_frame").isNotNull)
    annotated
      .filter(col("frameId") === col("arrive_frame") &&
        col("team_pos") === "DEF" && col("nflId") =!= 0)
      .groupBy("gameId", "playId")
      .agg(
        min(sqrt(pow(col("x") - col("ball_x"), 2) +
          pow(col("y") - col("ball_y"), 2))).as("def_dist"),
        first((col("arrive_frame") - col("throw_frame")) / 10.0).as("tof"))
      .join(plays.select(col("gameId"), col("playId"),
        when(col("passResult") === "C", 1).otherwise(0).as("completed")),
        Seq("gameId", "playId"))
      .select("def_dist", "tof", "completed")
  }

  /** Default search grid around the reference's published params
    * (`analysis/models/params.py`: σ=0.31, a=7.67, s=9.42). */
  def defaultGrid: Seq[Candidate] = {
    val sigmas = Seq(0.15, 0.25, 0.31, 0.45, 0.6)
    val accels = Seq(6.0, 7.67, 9.0)
    val speeds = Seq(8.5, 9.42, 10.5)
    (for {
      (s, i) <- sigmas.zipWithIndex
      (a, j) <- accels.zipWithIndex
      (v, l) <- speeds.zipWithIndex
    } yield Candidate(i * 100 + j * 10 + l, s, a, v)).toSeq
  }
}
