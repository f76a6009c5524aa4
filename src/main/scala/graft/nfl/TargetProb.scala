package graft.nfl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** M6 — receiver-target bivariate Gaussian field
  * (`analysis/target_probability.ipynb` cells 4, 6): for each frame, each
  * candidate receiver is led along their current kinematics to a target
  * point per flight time T, and a rotated 2×2-covariance Gaussian centered
  * there spreads the aim probability over the field grid; summing over
  * receivers and normalizing over (cell, T) gives P(throw lands at cell
  * with flight T | this frame).
  *
  * Σ is built in the receiver's velocity frame — major axis along motion,
  * scaled by distance-from-QB (`dist_infl = min(10, 4 + d²/54)`) and
  * speed (`speed_infl = (v/11.3)²`) — then rotated by v_theta:
  * Σ = Rᵀ diag(a₀, b₀) R with a₀ = dist_infl·(1+speed_infl),
  * b₀ = dist_infl·(1−speed_infl). Rotation preserves det = a₀·b₀, and the
  * inverse has the closed form used below, so the whole pdf is plain
  * column arithmetic — no linear-algebra library, no UDF, every row
  * independent (Tungsten codegen end-to-end).
  *
  * Scale shape: receivers×T rows (~200/frame) cross-join a broadcast
  * 6,600-cell grid → ~1.3M rows/frame, map-side partial-aggregated into
  * the (frame, cell, T) sum — one shuffle on the frame key, one window
  * for the normalizer. Grid note: we use the regular −0.5 y origin, not
  * the notebook's y[0] = −0.2 quirk (same divergence as the kernel,
  * documented in FrameEppa).
  */
object TargetProb {

  /** Notebook cell 2 params (differ from the kernel's params.py on
    * purpose — the notebook tuned its own). */
  val AMax = 8.0
  val VMax = 9.0
  val AvgBallSpeed = 19.5
  val PocketWidth = 10.0
  val SpeedNorm = 11.3

  /** Candidate receivers per frame with QB anchor and covariance terms:
    * OFF players (not the QB) who are past the LOS or outside the pocket
    * (notebook cell 4 receivers_df filter). */
  def receivers(norm: DataFrame): DataFrame = {
    val qb = norm.filter(col("position") === "QB" && col("nflId") =!= 0)
      .groupBy("gameId", "playId", "frameId")
      // bround = half-even, matching the notebook's numpy .round(0)
      .agg(bround(first("x"), 0).as("ball_x"), bround(first("y"), 0).as("ball_y"))
    norm.filter(col("nflId") =!= 0 && col("team_pos") === "OFF" &&
        col("position") =!= "QB")
      .join(qb, Seq("gameId", "playId", "frameId"))
      .filter(col("x") > col("los") ||
        col("y") > col("ball_y") + PocketWidth / 2 ||
        col("y") < col("ball_y") - PocketWidth / 2)
      .withColumn("dist_from_ball",
        sqrt(pow(col("x") - col("ball_x"), 2) + pow(col("y") - col("ball_y"), 2)))
      .withColumn("dist_infl",
        least(lit(10.0), lit(4.0) + pow(col("dist_from_ball"), 2) / 54.0))
      .withColumn("speed_infl", pow(col("v_mag") / SpeedNorm, 2))
      .withColumn("sig_a0", col("dist_infl") * (lit(1.0) + col("speed_infl")))
      .withColumn("sig_b0", col("dist_infl") * (lit(1.0) - col("speed_infl")))
      .select("gameId", "playId", "frameId", "nflId", "x", "y",
        "v_x", "v_y", "v_theta", "a_x", "a_y", "sig_a0", "sig_b0")
  }

  /** The 120×55 field grid as a DataFrame (broadcast side of the cross
    * join — 6,600 rows). */
  def fieldGrid(spark: SparkSession): DataFrame =
    spark.range(FrameEppa.F.toLong).select(
      (col("id") % FrameEppa.Nx + 0.5).as("cell_x"),
      (floor(col("id") / FrameEppa.Nx) - 0.5).as("cell_y"))

  /** P(throw targets cell (x,y) with flight time T | frame): the full
    * (frame, cell, T) surface, normalized to sum to 1 per frame.
    * `nT` flight times 0.1..0.1·nT s. */
  def targetProbability(norm: DataFrame, nT: Int = FrameEppa.NT): DataFrame = {
    val spark = norm.sparkSession

    // receiver × T: lead the receiver by t along current kinematics
    // (target = x + v·t + ½a·t², notebook cell 4) and precompute the
    // rotated inverse covariance: for Σ = Rᵀ diag(a0,b0) R,
    // Σ⁻¹ = Rᵀ diag(1/a0, 1/b0) R and det Σ = a0·b0.
    val c = cos(col("v_theta")); val s = sin(col("v_theta"))
    val ia = lit(1.0) / col("sig_a0"); val ib = lit(1.0) / col("sig_b0")
    val recT = receivers(norm)
      .withColumn("t", explode(expr(
        s"transform(sequence(1, $nT), i -> CAST(i AS DOUBLE) / 10.0)")))
      .withColumn("target_x",
        col("x") + col("v_x") * col("t") + col("a_x") * col("t") * col("t") / 2)
      .withColumn("target_y",
        col("y") + col("v_y") * col("t") + col("a_y") * col("t") * col("t") / 2)
      .withColumn("inv_xx", ia * c * c + ib * s * s)
      .withColumn("inv_xy", c * s * (ia - ib))
      .withColumn("inv_yy", ia * s * s + ib * c * c)
      .withColumn("norm_const",
        lit(2.0 * math.Pi) * sqrt(col("sig_a0") * col("sig_b0")))
      .select("gameId", "playId", "frameId", "t", "target_x", "target_y",
        "inv_xx", "inv_xy", "inv_yy", "norm_const")

    val dx = col("cell_x") - col("target_x")
    val dy = col("cell_y") - col("target_y")
    val quad = dx * dx * col("inv_xx") + lit(2.0) * dx * dy * col("inv_xy") +
      dy * dy * col("inv_yy")
    val pdf = exp(-quad / 2) / col("norm_const")

    val perCell = recT
      .crossJoin(broadcast(fieldGrid(spark)))
      .withColumn("pdf", pdf)
      // sum over receivers (map-side combinable)
      .groupBy("gameId", "playId", "frameId", "cell_x", "cell_y", "t")
      .agg(sum("pdf").as("pdf_sum"))

    val wFrame = Window.partitionBy("gameId", "playId", "frameId")
    perCell
      .withColumn("target_prob", col("pdf_sum") / sum("pdf_sum").over(wFrame))
      .drop("pdf_sum")
  }
}
