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
  *
  * Two fitters share that forward model:
  *  - [[fit]] — coarse grid search, ONE job for the whole grid;
  *  - [[fitAdam]] — the reference's actual optimizer re-expressed for
  *    Spark: a driver-side Adam loop where each step runs ONE
  *    distributed aggregation computing the analytic (loss, gradient)
  *    over all observations (the MLlib GradientDescent/LBFGS pattern —
  *    model on the driver, data never leaves the executors). Gradients
  *    go through the piecewise closed-form time-to-intercept; the
  *    parameters are optimized in log space so positivity is structural,
  *    matching the role of torch's re-parameterization.
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

  final case class AdamResult(ttiSigma: Double, aMax: Double, sMax: Double,
                              bce: Double, iters: Int, n: Long)

  /** Continuous M4 fit: Adam on the driver, data on the cluster.
    *
    * Each step evaluates mean BCE and its analytic gradient w.r.t.
    * (tti_sigma, a_max, s_max) in ONE aggregation over `observations`
    * (four `avg`s + a `count`, all codegen'd column expressions — no
    * UDF, no collect). The driver holds only the 3-parameter state and
    * Adam moments; at 100 TB the per-step cost is one map-side-combined
    * pass, exactly like MLlib's iterative optimizers.
    *
    * Derivation (p = σ_logistic(k·(tof − T)), k = π/(√3·σ_tti)):
    * dBCE/dz = p − (1 − completed); T is the piecewise F2 form —
    * accelerating regime T = √(2d/a) with ∂T/∂a = −T/(2a), cruising
    * regime T = s/(2a) + d/s with ∂T/∂a = −s/(2a²), ∂T/∂s = 1/(2a) −
    * d/s² (continuous at the regime boundary, so a.e. differentiable).
    * Parameters live in log space: u = ln θ, ∇u = θ·∇θ.
    */
  def fitAdam(observations: DataFrame,
              initSigma: Double = 0.5, initA: Double = 6.0, initS: Double = 8.5,
              iters: Int = 200, lr: Double = 0.05,
              tol: Double = 1e-7): AdamResult = {
    val obs = observations.select(
      col("def_dist").cast("double").as("d"),
      col("tof").cast("double").as("t"),
      col("completed").cast("double").as("y"))
    obs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    /** One distributed pass: (meanBce, grad σ, grad a, grad s, n). */
    def step(sigma: Double, a: Double, s: Double): (Double, Array[Double], Long) = {
      val d = col("d"); val t = col("t"); val y = col("y")
      val dLt = s * s / (2.0 * a)
      val accel = d <= lit(dLt)
      val tT = when(accel, sqrt(d * 2.0 / a)).otherwise(lit(s / (2.0 * a)) + d / s)
      val dTda = when(accel, -tT / (2.0 * a)).otherwise(lit(-s / (2.0 * a * a)))
      val dTds = when(accel, lit(0.0)).otherwise(lit(1.0 / (2.0 * a)) - d / (s * s))
      val k = math.Pi / (math.sqrt(3.0) * sigma)
      // clamp z so exp() cannot overflow; gradient past ±30 is 0/1-saturated anyway
      val z = greatest(least(lit(k) * (t - tT), lit(30.0)), lit(-30.0))
      val p = lit(1.0) / (exp(-z) + 1.0) // P(intercept) ⇒ completion prob is 1−p
      val pComp = greatest(least(lit(1.0) - p, lit(1 - 1e-9)), lit(1e-9))
      val bce = -(y * log(pComp) + (lit(1.0) - y) * log(lit(1.0) - pComp))
      val dLdz = p - (lit(1.0) - y)
      val gSigma = dLdz * (-z / sigma)      // ∂z/∂σ = −z/σ (z = c(t−T)/σ)
      val gA = dLdz * lit(-k) * dTda
      val gS = dLdz * lit(-k) * dTds
      val r = obs.agg(
        avg(bce).as("l"), avg(gSigma).as("gs"), avg(gA).as("ga"),
        avg(gS).as("gv"), count(lit(1)).as("n")).head()
      (r.getDouble(0), Array(r.getDouble(1), r.getDouble(2), r.getDouble(3)), r.getLong(4))
    }

    // Adam in log space (positivity is structural)
    val u = Array(math.log(initSigma), math.log(initA), math.log(initS))
    val m = new Array[Double](3); val v = new Array[Double](3)
    val b1 = 0.9; val b2 = 0.999; val eps = 1e-8
    var bestU = u.clone(); var bestLoss = Double.MaxValue
    var lastLoss = Double.MaxValue; var n = 0L
    var it = 0; var done = false
    while (it < iters && !done) {
      val (loss, g, nn) = step(math.exp(u(0)), math.exp(u(1)), math.exp(u(2)))
      n = nn
      if (loss < bestLoss) { bestLoss = loss; bestU = u.clone() }
      if (math.abs(lastLoss - loss) < tol) done = true
      lastLoss = loss
      val tAdam = it + 1
      var i = 0
      while (i < 3) {
        val gu = g(i) * math.exp(u(i)) // chain rule into log space
        m(i) = b1 * m(i) + (1 - b1) * gu
        v(i) = b2 * v(i) + (1 - b2) * gu * gu
        val mh = m(i) / (1 - math.pow(b1, tAdam))
        val vh = v(i) / (1 - math.pow(b2, tAdam))
        u(i) -= lr * mh / (math.sqrt(vh) + eps)
        i += 1
      }
      it += 1
    }
    obs.unpersist()
    AdamResult(math.exp(bestU(0)), math.exp(bestU(1)), math.exp(bestU(2)),
      bestLoss, it, n)
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
