package graft.nfl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Movement analytics over normalized tracking — the reference's
  * `analysis/movement_stats.ipynb` and SURVEY §7.2's minimum end-to-end
  * slice: rolling speed (W2) → per-play max → per-player max (A5) →
  * position-group quantiles (A4) → ranked output (O1).
  *
  * Window chain reuses one (gameId, playId, nflId) exchange; the two-level
  * max is two map-side-combinable aggregations; quantiles use exact
  * `percentile` at test scale with `percentile_approx` as the documented
  * 100 TB swap-in.
  */
object MovementStats {

  /** 20-frame trailing mean of speed per actor (movement_stats cell 2). */
  def rollingSpeed(norm: DataFrame, frames: Int = 20): DataFrame = {
    val w = Window.partitionBy("gameId", "playId", "nflId")
      .orderBy("frameId").rowsBetween(-(frames - 1), 0)
    norm.filter(col("nflId") > 0)
      .withColumn("v_mag_roll", avg(col("v_mag")).over(w))
  }

  /** Per-player max of per-play max rolling speed (A5, cells 3-4). */
  def playerMaxSpeed(norm: DataFrame): DataFrame =
    rollingSpeed(norm)
      .groupBy("gameId", "playId", "nflId", "displayName", "position_general")
      .agg(max("v_mag_roll").as("play_max"))
      .groupBy("nflId", "displayName", "position_general")
      .agg(max("play_max").as("max_speed"), count(lit(1)).as("n_plays"))

  /** Position-group speed quantiles (A4, cells 5,11,17). */
  def positionQuantiles(norm: DataFrame): DataFrame =
    playerMaxSpeed(norm)
      .groupBy("position_general")
      .agg(percentile(col("max_speed"), lit(0.5)).as("p50"),
           percentile(col("max_speed"), lit(0.9)).as("p90"),
           percentile(col("max_speed"), lit(0.99)).as("p99"),
           count(lit(1)).as("n_players"))
      .orderBy("position_general")

  /** Flagship ranking: top-k fastest players per position group (O1 +
    * W4: window rank, not global sort). */
  def topSpeedByPosition(norm: DataFrame, k: Int = 10): DataFrame = {
    val w = Window.partitionBy("position_general")
      .orderBy(col("max_speed").desc, col("nflId"))
    playerMaxSpeed(norm)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("position_general", "rank")
  }

  /** Per-play event list (A10, movement_stats cell 24). */
  def playEvents(norm: DataFrame): DataFrame =
    norm.filter(col("event").isNotNull)
      .groupBy("gameId", "playId")
      .agg(array_sort(collect_set("event")).as("events"),
           min(when(col("event") === "ball_snap", col("frameId"))).as("snap_frame"),
           min(when(col("event") === "pass_forward", col("frameId"))).as("throw_frame"))
}
